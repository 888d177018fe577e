package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the shapes AQE's skew-join splitting
  * doesn't cover (e.g. a skewed *aggregation* key, or a skewed join where
  * the build side must replicate).
  *
  *  - [[saltedAggregate]]: two-stage aggregation — stage 1 aggregates on
  *    (key, salt) spreading a hot key over `salts` reducers, stage 2
  *    combines the partials. Works for any algebraic aggregate the
  *    caller expresses as (partial, combine) column pairs.
  *  - [[saltedJoin]]: salts the skewed (large) side and replicates the
  *    small side `salts`× so the hot key's rows land on different
  *    reducers. For broadcast-able small sides prefer `broadcast()`;
  *    this is for the mid-size case where neither broadcast nor plain
  *    shuffle-join behaves.
  */
object Skew {

  /** Deterministic salt in [0, salts) derived from stable row content. */
  private def saltCol(salts: Int, on: Column): Column = pmod(xxhash64(on), lit(salts))

  /** Two-stage salted sum/count aggregation over `key`.
    * `sums` maps output name → column to sum. Also emits `n_rows`. */
  def saltedAggregate(df: DataFrame, key: String, sums: Map[String, Column],
                      saltSource: Column, salts: Int = 16): DataFrame = {
    val stage1 = df
      .withColumn("__salt", saltCol(salts, saltSource))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"),
        sums.map { case (name, c) => sum(c).as(s"__s_$name") }.toSeq: _*)
    stage1.groupBy(col(key))
      .agg(sum(col("__n")).as("n_rows"),
        sums.keys.map(name => sum(col(s"__s_$name")).as(name)).toSeq: _*)
  }

  /** Salted equi-join: `large` (skewed) gets a content-derived salt,
    * `small` is replicated across all salt values. Join keys must be
    * equal-named (`keys`). */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 saltSource: Column, salts: Int = 8,
                 joinType: String = "inner"): DataFrame = {
    // right/full outer would surface each unmatched small-side row once
    // PER SALT REPLICA — reject join types whose semantics replication
    // breaks.
    val safe = Set("inner", "left", "left_outer", "cross")
    require(safe.contains(joinType.toLowerCase),
      s"saltedJoin supports ${safe.mkString("/")} joins; '$joinType' would " +
        "duplicate unmatched replicated-side rows")
    val l = large.withColumn("__salt", saltCol(salts, saltSource))
    val s = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    l.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}
