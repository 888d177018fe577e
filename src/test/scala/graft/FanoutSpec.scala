package graft

import org.apache.spark.sql.functions._
import graft.core.Fanout

/** r20 optimization-round spec: [[Fanout.spread]] fans CPU-dense narrow
  * stages out ONLY when the planned scan parallelism is below the core
  * count, and never changes results. */
class FanoutSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  // big enough (584 KB documents) that the bytes-derived fan-out width
  // exceeds both the 1-split scan and 64 KB/task; sf0.001's 64 KB file
  // is below SpreadBytesPerTask and deliberately does NOT fan out
  private val dBig = "/root/testdata/sf0.1"

  test("spread fans a narrow file scan out (bytes-derived width)") {
    val docs = graft.Tables.documents(spark, dBig)
    assert(Fanout.plannedScanTasks(docs).exists(_ < spark.sparkContext.defaultParallelism))
    val p = Fanout.spread(docs, col("doc_id")).queryExecution.executedPlan.toString
    assert(p.contains("REPARTITION_BY_NUM"),
      s"narrow scan should gain the fan-out exchange:\n$p")
    // explicit partition count: AQE must never coalesce the fan-out away
    assert(p.contains(s"hashpartitioning(doc_id#"), p)
  }

  test("spread is a no-op below one task's worth of input bytes") {
    val docs = graft.Tables.documents(spark, d) // 64 KB file
    val p = Fanout.spread(docs, col("doc_id")).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"sub-64KB input should not pay a fan-out exchange:\n$p")
  }

  test("spread is a no-op when the scan already plans >= cores splits") {
    withAtScaleScans {
      val docs = graft.Tables.documents(spark, dBig)
      assert(Fanout.plannedScanTasks(docs).exists(_ >= spark.sparkContext.defaultParallelism))
      val p = Fanout.spread(docs, col("doc_id")).queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"wide scan must keep its shape:\n$p")
    }
  }

  test("spread is a no-op on driver-local literal frames") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "t")
    assert(Fanout.plannedScanTasks(df).isEmpty)
    val p = Fanout.spread(df, col("id")).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("spread counts checkpointed-RDD leaves by their real partitioning") {
    val ck = graft.Tables.documents(spark, dBig)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .localCheckpoint()
    assert(Fanout.plannedScanTasks(ck)
      .exists(_ >= spark.sparkContext.defaultParallelism))
    val p = Fanout.spread(ck, col("doc_id")).queryExecution.executedPlan.toString
    assert(!p.contains("REPARTITION_BY_NUM"),
      s"already-wide checkpoint must not re-shuffle:\n$p")
  }

  test("fan-out changes no results (minhash pairs bit-identical)") {
    val corpus = graft.queries.TextQueries.nearDupCorpus(spark, dBig)
    def pairs() = graft.operators.Dedup.minhashLshPairsShared(
      corpus, "doc_id", "text", n = 3, bands = 16, rowsPerBand = 8,
      threshold = 0.6).orderBy("id_a", "id_b").collect().toSeq
    val spreadRun = pairs() // narrow input: fan-out active
    val plainRun = withAtScaleScans { pairs() } // at-scale geometry: no fan-out
    assert(spreadRun == plainRun)
    assert(spreadRun.nonEmpty)
  }
}
