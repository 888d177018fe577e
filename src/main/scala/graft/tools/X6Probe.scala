package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Forensics for the x6 gate: where does the time go — pair generation
  * (the x3 MinHash pipeline) or the components iteration? Prints each
  * piece timed separately, twice (cold + warm). */
object X6Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (round <- 1 to 2) {
      println(s"round $round")
      val corpus = graft.queries.TextQueries.nearDupCorpus(spark, sfDir)
      val pairs = graft.operators.Dedup.minhashLshPairsShared(
        corpus, "doc_id", "text", n = 3, bands = 16, rowsPerBand = 8, threshold = 0.6)
      val p = time("pairs (x3 pipeline)")(pairs.localCheckpoint())
      time("pairs count")(println("    pairs=" + p.count()))
      val comp = time("components")(
        graft.operators.Dedup.components(p, "id_a", "id_b").count())
      println("    comp rows=" + comp)
      time("full x6 gate")(
        graft.SparkEntry.queries("x6_dup_clusters")(spark, sfDir).count())
      System.gc()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}

