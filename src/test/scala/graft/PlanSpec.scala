package graft

/** Physical-plan regression guards: the perf properties `graft.Explain`
  * is used to audit manually, asserted programmatically so a refactor
  * can't silently lose pushdown or broadcast shapes. */
class PlanSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString

  test("s3 scan keeps filter pushdown and column pruning") {
    val p = plan("s3_parquet_scan_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"), p)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"), p)
  }

  test("star join broadcasts every dimension side") {
    val p = plan("star_join_revenue")
    assert(p.split("BroadcastHashJoin").length - 1 >= 3, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("fact builds broadcast their dims (no shuffle on the dim side)") {
    for (q <- Seq("fct_investments_build", "fct_ipos_build", "fct_acquisition_build")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast joins")
    }
  }

  test("q1 aggregation is partial+final (map-side combine present)") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("HashAggregate"), p)
    // partial agg appears below the exchange: two HashAggregate nodes
    assert(p.split("HashAggregate").length - 1 >= 2, p)
  }
}
