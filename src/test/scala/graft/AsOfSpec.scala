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

  test("forward direction picks earliest right row at or after left time") {
    val left = Seq((1L, "k1", 10L), (2L, "k1", 16L), (3L, "k1", 99L))
      .toDF("id", "k", "t")
    val right = Seq(("k1", 10L, "a"), ("k1", 15L, "b"), ("k1", 40L, "c"))
      .toDF("k", "t", "v")
    val got = AsOf.join(left, right, Seq("k"), "t", Seq("v"),
      AsOf.Forward, None)
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("asof_v")))
    assert(got.toSeq == Seq(
      (1L, "a"),   // inclusive at equal time
      (2L, "c"),   // earliest of {40->c}; 15->b is in the past
      (3L, null))) // nothing at or after 99
  }

  test("tolerance nulls matches beyond the bound, row survives") {
    val left = Seq((1L, "k", 10L), (2L, "k", 100L)).toDF("id", "k", "t")
    val right = Seq(("k", 8L, "near"), ("k", 9L, "nearer")).toDF("k", "t", "v")
    val got = AsOf.join(left, right, Seq("k"), "t", Seq("v"),
      AsOf.Backward, Some(5L))
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("asof_v")))
    // left t=10: match t=9, distance 1 <= 5 -> kept; left t=100: match
    // t=9 but distance 91 > 5 -> nulled, row still present
    assert(got.toSeq == Seq((1L, "nearer"), (2L, null)))
  }

  test("payload column named __rt is rejected") {
    val df = Seq(("k", 1L, "x")).toDF("k", "t", "__rt")
    val ex = intercept[IllegalArgumentException] {
      AsOf.join(df.toDF("k", "t", "id"), df, Seq("k"), "t", Seq("__rt"))
    }
    assert(ex.getMessage.contains("__rt"))
  }

  test("right rows with null time never match (pandas merge_asof parity)") {
    val left = Seq((1L, "k", 10L)).toDF("id", "k", "t")
    val right = Seq(("k", Option.empty[Long], "ghost"), ("k", Some(5L), "real"))
      .toDF("k", "t", "v")
    val got = AsOf.join(left, right, Seq("k"), "t", Seq("v")).collect()(0)
    // the null-time row must not be carried (it would otherwise sort
    // first and be skipped only by luck of the window frame) — and with
    // a tolerance the null right time must not poison the bound check
    assert(got.getAs[String]("asof_v") == "real")
    val withTol = AsOf.join(left, right, Seq("k"), "t", Seq("v"),
      AsOf.Backward, Some(100L)).collect()(0)
    assert(withTol.getAs[String]("asof_v") == "real")
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
