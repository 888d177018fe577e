package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's operator inventory (SURVEY §2) expressed over
  * the driver's testdata; `oracleSql` carries the DuckDB-equivalent SQL for
  * the hash-compare correctness gate. Query groups live under
  * `graft.queries.*`; the library itself is `graft.functions` /
  * `graft.operators` / `graft.sources` / `graft.streaming`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A star-schema revenue rollup: lineitem → orders → customer → nation →
    * region, with the three small dims explicitly broadcast (no shuffle on
    * the dim side at any scale). */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = lineitem(spark, d)
    val o  = orders(spark, d)
    val c  = customer(spark, d)
    val n  = nation(spark, d)
    val r  = region(spark, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(BigDecimal(1)) - col("l_discount").cast("decimal(18,2)")))
          .cast("decimal(28,6)")).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("r_name"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.CleaningQueries.queries ++
      graft.queries.DimDateQueries.queries ++
      graft.queries.WarehouseQueries.queries ++
      graft.queries.ProfilerQueries.queries ++
      graft.queries.JoinQueries.queries ++
      graft.queries.SourceQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.SimilarityQueries.queries ++
      graft.queries.StreamingQueries.queries ++
      graft.queries.WindowSetQueries.queries ++
      graft.queries.AnalyticsQueries.queries ++
      graft.queries.DatasetQueries.queries ++
      graft.queries.LmQueries.queries ++
      graft.queries.QuantQueries.queries ++
      graft.queries.ClassifierQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracle ++
      graft.queries.CleaningQueries.oracle ++
      graft.queries.DimDateQueries.oracle ++
      graft.queries.WarehouseQueries.oracle ++
      graft.queries.ProfilerQueries.oracle ++
      graft.queries.JoinQueries.oracle ++
      graft.queries.SourceQueries.oracle ++
      graft.queries.TextQueries.oracle ++
      graft.queries.SimilarityQueries.oracle ++
      graft.queries.StreamingQueries.oracle ++
      graft.queries.WindowSetQueries.oracle ++
      graft.queries.AnalyticsQueries.oracle ++
      graft.queries.DatasetQueries.oracle ++
      graft.queries.LmQueries.oracle ++
      graft.queries.QuantQueries.oracle ++
      graft.queries.ClassifierQueries.oracle
}
