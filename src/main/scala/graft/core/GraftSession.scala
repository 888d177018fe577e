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

  /** S3A object-store settings for an S3-compatible endpoint (MinIO,
    * Ceph, AWS) — the engine's equivalent of the reference wiring
    * hadoop-aws onto its session (reference
    * `dags/vcapital_staging/tasks/extract_db.py:18-31`: endpoint +
    * access/secret key + path-style access + SSL toggle). Credentials
    * should come from the caller's secret store, never source.
    *
    * Pure configuration: paths like `s3a://bucket/…` then work in every
    * reader/writer in [[graft.sources.Readers]]/`Writers` unchanged,
    * provided the hadoop-aws + aws-sdk jars are on the cluster
    * classpath (they ship with most managed Spark distributions; they
    * are not in this repo's test environment, so coverage here is a
    * conf-landing unit test, not a live read). */
  def s3aConf(endpoint: String, accessKey: String, secretKey: String,
              pathStyleAccess: Boolean = true,
              sslEnabled: Boolean = false): Map[String, String] = Map(
    "fs.s3a.endpoint"                -> endpoint,
    "fs.s3a.access.key"              -> accessKey,
    "fs.s3a.secret.key"              -> secretKey,
    "fs.s3a.path.style.access"       -> pathStyleAccess.toString,
    "fs.s3a.connection.ssl.enabled"  -> sslEnabled.toString,
    "fs.s3a.impl" -> "org.apache.hadoop.fs.s3a.S3AFileSystem")

  /** Apply filesystem conf onto a live session's Hadoop configuration
    * (session-wide: affects every subsequent read/write). */
  def withHadoopConf(spark: SparkSession, conf: Map[String, String]): SparkSession = {
    conf.foreach { case (k, v) => spark.sparkContext.hadoopConfiguration.set(k, v) }
    spark
  }
}
