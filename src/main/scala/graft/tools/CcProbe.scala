package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing audit for the x6 connected-components tail
  * (Y3Probe precedent: a committed, reproducible breakdown instead of
  * bench-subtraction archaeology). Times, separately:
  *
  *   1. the near-dup pair pipeline alone (the x3-equivalent cost);
  *   2. pairs -> symmetrized/partitioned/checkpointed edge list;
  *   3. label0 + each min-label iteration (reported individually, so
  *      an iteration-count change between corpora is visible);
  *   4. the final label projection + count.
  *
  * Usage: runMain graft.tools.CcProbe <sfDir>
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ccprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val pairs = graft.operators.Dedup.minhashLshPairsShared(
      graft.queries.TextQueries.nearDupCorpus(spark, sfDir), "doc_id", "text",
      n = 3, bands = 16, rowsPerBand = 8, threshold = 0.6)
    t("pairs pipeline (x3 cost)") { pairs.count() }
    val edges = t("edges checkpoint") {
      pairs.select(explode(array(
          struct(col("id_a").as("src"), col("id_b").as("dst")),
          struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .repartition(col("dst"))
        .localCheckpoint()
    }
    println(s"[ccprobe] edge rows: ${edges.count()}")
    var labels = t("label0 aggregate") {
      val l = edges.groupBy(col("src").as("id"))
        .agg(least(first(col("src")), min(col("dst"))).as("label"))
        .localCheckpoint(false)
      l.count()
      l
    }
    val labelType = labels.schema("label").dataType
    var converged = false
    var it = 0
    while (!converged && it < 20) {
      it += 1
      converged = t(s"iteration $it") {
        val msgs = edges.join(labels, col("dst") === col("id"))
          .select(col("src").as("id"), col("label"),
            lit(null).cast(labelType).as("__prev"))
        val self = labels.select(col("id"), col("label"),
          col("label").as("__prev"))
        val next = self.unionByName(msgs)
          .groupBy(col("id"))
          .agg(min(col("label")).as("label"), max(col("__prev")).as("__prev"))
          .localCheckpoint(false)
        val changed = next.filter(col("label") =!= col("__prev")).count()
        labels = next.drop("__prev")
        changed == 0
      }
    }
    t("final projection + count") {
      labels.select(col("id"), col("label").as("cluster_id")).count()
    }
    spark.stop()
  }
}
