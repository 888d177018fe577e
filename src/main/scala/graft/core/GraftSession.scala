package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the engine.
  *
  * The reference runs PySpark 3.5.5 on a 3-worker standalone cluster with
  * dynamicAllocation (reference `docker-compose.yml:129-184`,
  * `dags/vcapital_staging/tasks/extract_db.py:18-31`). We target Spark 4.x
  * local[32] for tests while keeping every setting meaningful on a real
  * multi-executor cluster:
  *
  *  - AQE on: runtime shuffle-partition coalescing + skew-join splitting are
  *    what make a fixed `shuffle.partitions` safe at 1000x the data.
  *  - shuffle.partitions = cores locally; on a cluster this is overridden by
  *    AQE's coalescing (initialPartitionNum stays high).
  *  - UTC session TZ so timestamp semantics match the reference's
  *    `timestamp without time zone` columns and the DuckDB oracle.
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(master: String = s"local[$cpus]"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); Spark reads it as long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.ui.enabled", "false")

  /** Get-or-create with engine defaults. */
  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
