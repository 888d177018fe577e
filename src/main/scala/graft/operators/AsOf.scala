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
           timeCol: String, payload: Seq[String]): DataFrame =
    join(left, right, keys, timeCol, payload, Backward, None)

  /** Match direction (pandas `merge_asof` surface). */
  sealed trait Direction
  /** Latest right row with `rightTime <= leftTime`. */
  case object Backward extends Direction
  /** Earliest right row with `rightTime >= leftTime`. */
  case object Forward extends Direction

  /** Directed, tolerance-bounded as-of join. Same single-shuffle
    * construction as the 5-arg form; `Forward` flips the carry to a
    * `first(...)` over the mirrored frame (right rows sort AFTER left
    * rows at equal time, so the equal-time match stays inclusive).
    * `tolerance` (in `timeCol` units — the column must be numeric)
    * nulls the payload when the matched right row is further than
    * `tolerance` from the left time, exactly pandas' contract: the row
    * survives, the match does not. The matched right time rides inside
    * the carried struct, so the bound costs no extra shuffle. */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           timeCol: String, payload: Seq[String],
           direction: Direction, tolerance: Option[Long]): DataFrame = {
    // "__rt" is reserved inside the carried struct for the matched right
    // time; a payload column of that name would create a duplicate
    // struct field and make getField("__rt") ambiguous.
    require(!payload.contains("__rt"),
      "asof: payload column name '__rt' is reserved")
    val leftCols = left.columns.toSeq
    // A right row with NULL time can never be "the most recent row at or
    // before t" — pandas merge_asof rejects NaT right keys; dropping them
    // up front keeps the carry ordered and the tolerance check non-null.
    val rightNonNull = right.filter(col(timeCol).isNotNull)
    // payload travels as ONE struct (+ the right time for the tolerance
    // check): last/first(ignoreNulls) then matches the nearest right ROW
    // even when individual payload fields are null (per-column carry
    // would skip over genuine nulls).
    val taggedRight = rightNonNull.select(
      keys.map(col) :+ col(timeCol) :+ lit(1).as("__is_right") :+
        struct((payload.map(col) :+ col(timeCol).as("__rt")): _*).as("__p"): _*)
    val pType = taggedRight.schema("__p").dataType
    val taggedLeft = left.select(
      leftCols.map(col) :+ lit(0).as("__is_right") :+
        lit(null).cast(pType).as("__p"): _*)
    // align schemas: right side lacks the non-key left columns
    val rightAligned = leftCols.foldLeft(taggedRight) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(taggedLeft.columns.map(col): _*)

    val base = Window.partitionBy(keys.map(col): _*)
    val carried = direction match {
      case Backward =>
        // right rows sort BEFORE left rows at equal time -> inclusive
        val w = base.orderBy(col(timeCol).asc, col("__is_right").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        last(col("__p"), ignoreNulls = true).over(w)
      case Forward =>
        // right rows sort AFTER left rows at equal time -> inclusive
        val w = base.orderBy(col(timeCol).asc, col("__is_right").asc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        first(col("__p"), ignoreNulls = true).over(w)
    }
    val withinTol: Column = tolerance match {
      case None => lit(true)
      case Some(t) => direction match {
        case Backward => col(timeCol) - col("__p").getField("__rt") <= t
        case Forward  => col("__p").getField("__rt") - col(timeCol) <= t
      }
    }
    taggedLeft.unionByName(rightAligned)
      .withColumn("__p", carried)
      .filter(col("__is_right") === 0)
      .withColumn("__p", when(col("__p").isNotNull && withinTol, col("__p")))
      .select(leftCols.map(col) ++
        payload.map(c => col("__p").getField(c).as(s"asof_$c")): _*)
  }
}
