package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfPq, Pq, Similarity}

/** IVF-PQ composition specs: twin recall through the probed lists,
  * degeneracy to plain PQ/ADC when every list is probed, and the
  * compressed-scan plan shape inherited from both parents. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def emb = graft.Tables.embeddings(spark, sf)

  test("identical twin reaches the top-k through its shared probe list") {
    // the twin has the query's exact vector -> same coarse cluster, same
    // codes; the query's rank-1 probe IS its own cluster, so the twin is
    // always a candidate and must surface at the minimum possible ADC
    val base = emb.select($"vec_id", Similarity.toDouble($"embedding").as("embedding"))
    val twin = emb.select(($"vec_id" + 100000L).as("vec_id"),
      Similarity.toDouble($"embedding").as("embedding"))
    val qs = Seq(1L, 2L, 3L)
    val got = IvfPq.ivfPqTopK(base.unionByName(twin), "vec_id", "embedding",
      qs, k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    qs.foreach { q =>
      val mine = got.filter(_._1 == q)
      val tw = mine.find(_._2 == q + 100000L)
      assert(tw.nonEmpty, s"twin of $q must be probed and ranked")
      assert(tw.get._3 == mine.map(_._3).min,
        "no candidate may beat the twin's (= self's) reconstruction distance")
    }
  }

  test("nprobe = c degenerates to plain PQ/ADC over the whole corpus") {
    val qs = Seq(0L, 1L, 2L, 3L)
    val full = Pq.adcTopK(emb, "vec_id", "embedding", qs, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val ivfpq = IvfPq.ivfPqTopK(emb, "vec_id", "embedding", qs, k = 10,
      c = 16, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(ivfpq == full,
      s"probing every list must equal unpartitioned ADC; diff=${(full diff ivfpq).take(3)}")
  }

  test("plan: corpus never shuffles; no vectors or codes in the exchange") {
    withAtScaleScans {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
      import org.apache.spark.sql.types.ArrayType
      val df = IvfPq.ivfPqTopK(emb, "vec_id", "embedding", Seq(0L, 1L), k = 5)
      val root: SparkPlan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case other => other
      }
      assert(root.collect { case e: BroadcastExchangeExec => e }.nonEmpty,
        "probes+luts must broadcast")
      val shuffles = root.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size == 1, s"only the top-k window exchange, got ${shuffles.size}")
      shuffles.foreach { e =>
        assert(!e.output.exists(_.dataType.isInstanceOf[ArrayType]),
          "neither vectors nor codes may shuffle: " +
            e.output.map(a => s"${a.name}:${a.dataType.simpleString}").mkString(", "))
      }
    }
  }
}
