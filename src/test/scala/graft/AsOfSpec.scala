package graft

import graft.operators.AsOf

/** As-of join semantics on hand-built cases: inclusive match at equal
  * time, no-match nulls, latest-wins, null payload fields carried from
  * the matched row (not skipped). */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("asof join picks latest right row at or before left time") {
    val left = Seq((1L, "k1", 10L), (2L, "k1", 20L), (3L, "k1", 5L), (4L, "k2", 50L))
      .toDF("id", "k", "t")
    val right = Seq(("k1", 10L, "a"), ("k1", 15L, "b"), ("k3", 1L, "z"))
      .toDF("k", "t", "v")
    val got = AsOf.join(left, right, Seq("k"), "t", Seq("v"))
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("asof_v")))
    assert(got.toSeq == Seq(
      (1L, "a"),   // inclusive: right at t=10 matches left at t=10
      (2L, "b"),   // latest of {10->a, 15->b}
      (3L, null),  // nothing at or before t=5
      (4L, null))) // key k2 has no right rows
  }

  test("null payload field on the matched row is returned, not skipped") {
    val left = Seq((1L, "k", 30L)).toDF("id", "k", "t")
    val right = Seq(("k", 10L, Some("old")), ("k", 20L, Option.empty[String]))
      .toDF("k", "t", "v")
    val got = AsOf.join(left, right, Seq("k"), "t", Seq("v")).collect()(0)
    // matched row is (k, 20, null) -> asof_v must be null, NOT "old"
    assert(got.isNullAt(got.fieldIndex("asof_v")))
  }
}
