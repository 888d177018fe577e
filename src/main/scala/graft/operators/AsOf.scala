package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (time-travel) join — attach to each left row the most recent
  * right row with the same key and `rightTime <= leftTime`. Spark has no
  * native ASOF JOIN; the standard scalable composition (preference (a)
  * of the build brief: compose built-ins before custom plans) is:
  *
  *   1. tag and union both sides on a common schema,
  *   2. one shuffle: window partitioned by key, ordered by
  *      (time, isRightFirst),
  *   3. `last(value, ignoreNulls=true)` carries the latest right payload
  *      forward onto each left row,
  *   4. keep left rows.
  *
  * Cost: ONE shuffle of |L|+|R| rows by key — no range-condition join
  * explosion (a naive `l.t >= r.t` theta join is O(|L|·|R|) per key).
  * Right rows at exactly the left timestamp match (inclusive), same as
  * DuckDB/pandas asof semantics — the DuckDB oracle uses its native
  * ASOF JOIN against this implementation. */
object AsOf {

  /** NULL-key caveat: `Window.partitionBy` groups null keys into one
    * partition, so null keys MATCH EACH OTHER here — SQL equality (and
    * DuckDB ASOF) would return no match. Filter null-keyed rows first if
    * SQL semantics are required.
    *
    * @param left      probe side
    * @param right     reference side (must be unique per (keys, timeCol)
    *                  for deterministic results)
    * @param keys      equality key column names (same names both sides)
    * @param timeCol   ordering column name (same name both sides)
    * @param payload   right-side columns to carry onto left rows */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           timeCol: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // payload travels as ONE struct: last(ignoreNulls) then matches the
    // latest right ROW even when individual payload fields are null
    // (per-column carry would skip over genuine nulls).
    val taggedRight = right.select(
      keys.map(col) :+ col(timeCol) :+ lit(1).as("__is_right") :+
        struct(payload.map(col): _*).as("__p"): _*)
    val pType = taggedRight.schema("__p").dataType
    val taggedLeft = left.select(
      leftCols.map(col) :+ lit(0).as("__is_right") :+
        lit(null).cast(pType).as("__p"): _*)
    // align schemas: right side lacks the non-key left columns
    val rightAligned = leftCols.foldLeft(taggedRight) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(taggedLeft.columns.map(col): _*)

    // right rows sort BEFORE left rows at equal time -> inclusive match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedLeft.unionByName(rightAligned)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)
      .select(leftCols.map(col) ++
        payload.map(c => col("__p").getField(c).as(s"asof_$c")): _*)
  }
}
