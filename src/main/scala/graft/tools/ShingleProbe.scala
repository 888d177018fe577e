package graft.tools

import org.apache.spark.sql.functions._

/** r21: decompose the x-family signature stage's per-row cost —
  * tokenize vs shingle-string construction vs distinct vs hashing —
  * to size a shingle-hash kernel before building it. Noop sinks
  * (guide §1.4), median of 5 after a warm-up. */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.TextAnalysis
    import graft.operators.Dedup

    val corpus = graft.queries.TextQueries.nearDupCorpus(spark, sfDir)
    val base = graft.core.Fanout.spread(corpus, col("doc_id"))
      .select(col("doc_id").as("id"), TextAnalysis.tokens(col("text")).as("__toks"))

    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val ts = (1 to 5).map(_ => once())
      println(f"[shingle] $tag%-44s med=${ts.sorted.apply(2)}%6.3f s " +
        ts.map(t => f"$t%.3f").mkString("[", ",", "]"))
    }

    time("tokens only (size agg)") {
      base.select(col("id"), size(col("__toks")).as("n"))
    }
    val rawShingles = transform(
      sequence(lit(0), greatest(size(col("__toks")) - 3, lit(0))),
      i => concat_ws(" ", slice(col("__toks"), i + 1, lit(3))))
    time("+ shingle strings (no distinct, size)") {
      base.select(col("id"), size(rawShingles).as("n"))
    }
    time("+ shingle strings forced (explode, len sum)") {
      base.select(col("id"), explode(rawShingles).as("g"))
        .select(col("id"), length(col("g")).as("l"))
        .groupBy(col("id")).agg(sum(col("l")))
    }
    time("+ distinct (explode, len sum)") {
      base.select(col("id"), explode(Dedup.shinglesFromTokens(col("__toks"), 3)).as("g"))
        .select(col("id"), length(col("g")).as("l"))
        .groupBy(col("id")).agg(sum(col("l")))
    }
    time("+ h32+h64 (the sig-stage input rows)") {
      base.select(col("id"), explode(Dedup.shinglesFromTokens(col("__toks"), 3)).as("g"))
        .select(col("id"), TextAnalysis.tokenHash32(col("g")).as("h32"),
          xxhash64(col("g")).as("h64"))
        .groupBy(col("id")).agg(min(col("h32")), min(col("h64")))
    }
    spark.stop()
  }
}
