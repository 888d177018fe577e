package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink layer (SURVEY §2.1 S4, S5, S8).
  *
  * Scale notes vs the reference:
  *  - S4 parquet snapshots become *date-partitioned* writes with dynamic
  *    partition overwrite — re-running one day rewrites one partition,
  *    not the table (reference overwrites a date-suffixed object name,
  *    extract.py:43).
  *  - S5 JDBC append bounds the connection count by coalescing to
  *    `connections` partitions first (the reference writes with default
  *    parallelism — at cluster scale that's one DB connection per task).
  */
object Writers {

  /** S4: parquet snapshot overwrite. */
  def parquetOverwrite(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** S4 at scale: date-partitioned parquet with per-partition overwrite.
    * Requires spark.sql.sources.partitionOverwriteMode=dynamic to only
    * replace the partitions present in `df`. */
  def parquetPartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol).parquet(path)

  /** Snapshot replace that is safe when `df` READS from `path` (Spark
    * refuses a direct overwrite of an input path): write to a sibling
    * temp dir, then swap via filesystem rename — the upsert-merge sink
    * shape (staging `milestones` snapshot). Hadoop FS API, so the same
    * code path works on local disk and HDFS-like stores. */
  def parquetReplace(df: DataFrame, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val target = new Path(path)
    val tmp = new Path(path + "__tmp")
    val fs = target.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(target)) fs.delete(target, true)
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"parquetReplace: rename $tmp -> $target failed")
  }

  /** S8: CSV with header. */
  def csv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** JSON-lines sink (the lake form of the reference's raw-API-payload
    * persistence, extract.py:124-132). */
  def json(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC sink (columnar alternative to S4 — Spark-native, zstd-capable;
    * a user migrating from the reference keeps their format choice). */
  def orc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** S5: JDBC append with a bounded number of connections. */
  def jdbcAppend(df: DataFrame, url: String, table: String,
                 props: java.util.Properties, connections: Int = 8): Unit =
    df.coalesce(connections).write.mode(SaveMode.Append).jdbc(url, table, props)

  /** Small-file compaction: rewrite a parquet directory into at most
    * `targetFiles` files. The operational pass every long-running lake
    * needs — streaming sinks and per-day dynamic overwrites accumulate
    * thousands of KB-sized files, and at 100 TB the task-scheduling +
    * footer-read overhead of a million tiny files dominates the scan
    * (the public "small files problem"; Delta's OPTIMIZE / Iceberg's
    * rewrite_data_files are this pass productized). `coalesce` (not
    * `repartition`) — compaction must MERGE files without paying a full
    * shuffle of the data; rows are only concatenated, never moved
    * between existing partition boundaries' key ranges. Writes aside +
    * atomic-rename swap via [[parquetReplace]], so a reader never sees
    * a half-compacted directory. */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, path: String,
                     targetFiles: Int = 8): Unit = {
    require(targetFiles > 0, s"compactParquet: targetFiles=$targetFiles")
    parquetReplace(spark.read.parquet(path).coalesce(targetFiles), path)
  }
}
