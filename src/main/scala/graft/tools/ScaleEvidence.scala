package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Warehouse}

/** Dev tool: prints the scale-mechanism evidence for SCALE.md —
  * dense-key dispatch decision + windowed-vs-ranged timing on the
  * largest key domain, and candidate-pair volumes for the capped/banded
  * dedup paths (the numbers that show the caps bounding growth).
  *
  *   runMain graft.tools.ScaleEvidence <sfDir>
  */
object ScaleEvidence {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.get()
    spark.range(1000).selectExpr("sum(id)").collect()

    // --- dense-key dispatch on the largest dimension-like frame -------
    val orders = graft.Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val est = orders.queryExecution.optimizedPlan.stats.sizeInBytes
    val ranged = est > BigInt(Warehouse.DenseKeySmallBytes)
    println(s"[dispatch] orders stats=${est} bytes threshold=${Warehouse.DenseKeySmallBytes} -> ${if (ranged) "RANGED" else "WINDOWED"}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[time] $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // consume sk via an aggregate -- count() alone lets the optimizer
    // prune the unused window/key expression and times a bare scan
    def sumSk(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("sk"))).first().getLong(0)
    time("dense-key dispatch (auto)")(
      sumSk(Warehouse.withDenseKey(orders, "sk", "o_orderkey")))
    time("dense-key windowed (forced)")(
      sumSk(Warehouse.withDenseKeyWindowed(orders, "sk", "o_orderkey")))
    time("dense-key ranged (forced)")(
      sumSk(Warehouse.withDenseKeyRanged(orders, "sk", "o_orderkey")))

    // --- dispatch above threshold: synthetic frame big enough that the
    // stats estimate crosses DenseKeySmallBytes, so the auto path goes
    // ranged — the regime the threshold exists for.
    val big = spark.range(50000000L).select(col("id").as("k"))
    val bigEst = big.queryExecution.optimizedPlan.stats.sizeInBytes
    println(s"[dispatch] synthetic-50M stats=$bigEst -> ${if (bigEst > BigInt(Warehouse.DenseKeySmallBytes)) "RANGED" else "WINDOWED"}")
    time("big dense-key dispatch (auto=ranged)")(
      sumSk(Warehouse.withDenseKey(big, "sk", "k")))
    time("big dense-key windowed (forced)")(
      sumSk(Warehouse.withDenseKeyWindowed(big, "sk", "k")))

    // --- candidate volumes: caps bounding quadratic growth ------------
    val docs = graft.queries.TextQueries.nearDupCorpus(spark, d)
    val nDocs = docs.count()
    println(s"[corpus] docs=$nDocs")
    time("x2 candidate pairs (capped blocks + in-block bands)")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.0, 64).count())
    time("x3 banded candidate pairs (pre-verify)")(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 16, 8, 0.0).count())
    spark.stop()
  }
}
