package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextAnalysis

/** Throwaway component-timing probe for minhashLshPairs (dev only). */
object X3Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.get()
    spark.range(1000).selectExpr("sum(id)").collect()
    val df = graft.queries.TextQueries.nearDupCorpus(spark, d)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("tokenize-only")(df.select(explode(TextAnalysis.tokens(col("text")))).count())
    time("shingle+hash")(df.select(explode(transform(Dedup.shingles(col("text"), 3),
      g => xxhash64(g)))).count())
    time("grams-arrays")(df.select(col("doc_id"),
      transform(Dedup.shingles(col("text"), 3), g => xxhash64(g)).as("grams")).count())
    time("sigs-typed")(Dedup.minhashSignaturesTyped(df, "doc_id", "text", 3, 128).count())
    // prototype: pure-projection signatures — grams32 materialized, 128
    // array_min lanes over the attribute, no explode/agg/exchange
    time("sigs-array")({
      val toks = df.select(col("doc_id").as("id"),
        TextAnalysis.tokens(col("text")).as("__toks"))
      val grams = toks.select(col("id"),
        transform(Dedup.shinglesFromTokens(col("__toks"), 3),
          s => TextAnalysis.tokenHash32(s)).as("__g32"))
      val lanes = Dedup.hashParams(128).map { case (a, b) =>
        array_min(transform(col("__g32"), h => pmod(h * a + b, lit(Dedup.MinhashPrime))))
      }
      val out = grams.select(col("id"), array(lanes: _*).as("sig"))
      // consume every lane (xxhash64 of the full array) so nothing prunes
      out.select(expr("count(distinct xxhash64(sig))")).collect()(0).getLong(0)
    })
    time("sigs-typed-consumed")({
      Dedup.minhashSignaturesTyped(df, "doc_id", "text", 3, 128)
        .select(expr("count(distinct xxhash64(sig))")).collect()(0).getLong(0)
    })
    time("full-x3")(Dedup.minhashLshPairs(df, "doc_id", "text", 3, 16, 8, 0.6).count())
    time("full-x3-shared")(Dedup.minhashLshPairsShared(df, "doc_id", "text", 3, 16, 8, 0.6).count())
    time("full-x3-again")(Dedup.minhashLshPairs(df, "doc_id", "text", 3, 16, 8, 0.6).count())
    time("full-x3-shared-again")(Dedup.minhashLshPairsShared(df, "doc_id", "text", 3, 16, 8, 0.6).count())
    spark.stop()
  }
}
