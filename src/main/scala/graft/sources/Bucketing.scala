package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table utilities: pre-shuffle a fact table once at write time
  * so repeated equi-joins/aggregations on the bucket key run with NO
  * exchange (SURVEY §4 / the 100 TB co-located-join story).
  *
  * Spark bucketing requires the table catalog (`saveAsTable`) — plain
  * `.parquet(path)` writes ignore `bucketBy`. Both sides of a join must
  * be bucketed by the same key into the same bucket count for the
  * exchange to be elided (check with `.explain`: no Exchange above the
  * scans, SortMergeJoin directly over bucketed scans). */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int = 32): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on the bucket key — plans with zero
    * shuffle exchanges when bucket specs line up. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
