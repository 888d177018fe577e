package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r20 scratch probe: why does fanning the sig-frame stage to 32 tasks
  * cost ~600 ms PER TASK? Times the minhash signature aggregate over the
  * nearDup corpus at several explicit partition counts, with the UDAF vs
  * a builtin aggregate, so the fixed per-task cost can be attributed. */
object FanoutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextAnalysis

    def corpus = graft.queries.TextQueries.nearDupCorpus(spark, sfDir)
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val params = graft.operators.Dedup.hashParams(128)

    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      for (p <- Seq(0, 1, 8, 32)) {
        val base = if (p == 0) corpus else corpus.repartition(p, col("doc_id"))
        val toks = base.select(col("doc_id").as("id"),
          TextAnalysis.tokens(col("text")).as("__toks"))
        val rows = toks.select(col("id"),
          explode(graft.operators.Dedup.shinglesFromTokens(col("__toks"), 3)).as("g"))
          .select(col("id"), TextAnalysis.tokenHash32(col("g")).as("h32"),
            xxhash64(col("g")).as("h64"))
        time(s"p=$p tokenize+hash only (min agg)") {
          rows.groupBy(col("id")).agg(min(col("h32")), min(col("h64")))
            .write.format("noop").mode("overwrite").save()
        }
        val lanes = params.zipWithIndex.map { case ((a, b), i) =>
          min(pmod(col("h32") * a + b, lit(graft.operators.Dedup.MinhashPrime))).as(s"m$i")
        }
        time(s"p=$p 128 expr lanes") {
          rows.groupBy(col("id")).agg(lanes.head, lanes.tail: _*)
            .write.format("noop").mode("overwrite").save()
        }
        val agg = graft.operators.Dedup.minhashAgg(128)
        time(s"p=$p udaf sig") {
          rows.groupBy(col("id")).agg(agg(col("h32")).as("sig"))
            .write.format("noop").mode("overwrite").save()
        }
        time(s"p=$p udaf sig + collect_set") {
          rows.groupBy(col("id")).agg(agg(col("h32")).as("sig"),
              collect_set(col("h64")).as("grams"))
            .write.format("noop").mode("overwrite").save()
        }
        spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
          Int.MaxValue.toString)
        time(s"p=$p udaf sig + collect_set NOFALLBACK") {
          rows.groupBy(col("id")).agg(agg(col("h32")).as("sig"),
              collect_set(col("h64")).as("grams"))
            .write.format("noop").mode("overwrite").save()
        }
        spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
      }
    }
    spark.stop()
  }
}
