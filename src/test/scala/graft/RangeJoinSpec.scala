package graft

import graft.operators.RangeJoin

/** Range-join semantics: inclusive bounds, bucket-boundary spanning,
  * no duplicates, key isolation. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("inclusive bounds, boundary-spanning intervals, no dup matches") {
    val points = Seq((1L, "k", 100L), (2L, "k", 150L), (3L, "k", 201L), (4L, "z", 150L))
      .toDF("pid", "k", "t")
    // interval spans buckets with width 100: [95, 200]
    val intervals = Seq((10L, "k", 95L, 200L)).toDF("iid", "k", "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"), "t", "s", "e", 100L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // pid 1 (t=100 in [95,200]), pid 2 (150), NOT pid 3 (201 > 200,
    // exclusive above), NOT pid 4 (key z) — and each matched exactly once
    assert(got.toSeq == Seq((1L, 10L), (2L, 10L)))
  }

  test("interval end inclusive; point exactly at end matches") {
    val points = Seq((1L, "k", 200L)).toDF("pid", "k", "t")
    val intervals = Seq((10L, "k", 100L, 200L)).toDF("iid", "k", "s", "e")
    assert(RangeJoin.pointInInterval(points, intervals, Seq("k"), "t", "s", "e", 64L)
      .count() == 1)
  }
}
