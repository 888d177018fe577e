package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join — `points.t BETWEEN intervals.start AND
  * intervals.end` with optional equality keys. Spark plans a naive range
  * predicate as BroadcastNestedLoopJoin (O(|P|·|I|) comparisons); this
  * composition BUCKETIZES the time axis:
  *
  *   - each interval explodes to the buckets it overlaps
  *     (⌈len/width⌉+1 rows — bounded when `bucketWidth` ≳ typical
  *     interval length),
  *   - each point maps to exactly ONE bucket, so the equi-join on
  *     (keys, bucket) + residual BETWEEN filter produces no duplicates
  *     and needs no distinct,
  *   - the shuffle is an ordinary hash join on compact keys.
  *
  * Pick `bucketWidth` near the p95 interval length: too small explodes
  * interval rows, too large degrades to per-key cross join. */
object RangeJoin {

  /** @param points    rows with a long "coordinate" column `tCol`
    * @param intervals rows with long `startCol`/`endCol` (inclusive)
    * @param keys      equality key column names present on both sides */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], tCol: String,
                      startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket", floor(col(tCol) / bucketWidth))
    val iv = intervals
      .withColumn("__bucket", explode(sequence(
        floor(col(startCol) / bucketWidth), floor(col(endCol) / bucketWidth))))
    p.join(iv, keys :+ "__bucket")
      .filter(col(tCol) >= col(startCol) && col(tCol) <= col(endCol))
      .drop("__bucket")
  }
}
