package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.DimDate

/** Date-dimension coverage (SURVEY §2.6): the full 29,220-row, 25-column
  * dim_date generation, oracle-checked column-by-column against DuckDB's
  * own date kernels. */
object DimDateQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // DATE columns are surfaced as ISO-8601 strings on both sides so the
    // hash compare is independent of how date32 vs timestamp round-trips
    // through the driver's comparison layer.
    "d1_dim_date" -> { (s, _) =>
      val df = DimDate.build(s)
      val dateCols = df.schema.fields
        .filter(_.dataType == org.apache.spark.sql.types.DateType).map(_.name)
      dateCols.foldLeft(df)((acc, c) => acc.withColumn(c, col(c).cast("string")))
        .orderBy(col("date_id"))
    }
  )

  val oracle: Map[String, String] = Map(
    "d1_dim_date" ->
      """WITH d AS (
        |  SELECT CAST(range AS DATE) AS date_actual
        |  FROM range(DATE '1950-01-01', DATE '2030-01-01', INTERVAL 1 DAY))
        |SELECT
        |  CAST(strftime(date_actual, '%Y%m%d') AS INT) AS date_id,
        |  CAST(date_actual AS VARCHAR) AS date_actual,
        |  CAST(dayofmonth(date_actual) AS VARCHAR) ||
        |    CASE WHEN dayofmonth(date_actual) IN (11,12,13) THEN 'th'
        |         WHEN dayofmonth(date_actual) % 10 = 1 THEN 'st'
        |         WHEN dayofmonth(date_actual) % 10 = 2 THEN 'nd'
        |         WHEN dayofmonth(date_actual) % 10 = 3 THEN 'rd'
        |         ELSE 'th' END AS day_suffix,
        |  dayname(date_actual) AS day_name,
        |  CAST(dayofyear(date_actual) AS INT) AS day_of_year,
        |  CAST(ceil(dayofmonth(date_actual) / 7.0) AS INT) AS week_of_month,
        |  CAST(weekofyear(date_actual) AS INT) AS week_of_year,
        |  CAST(isoyear(date_actual) AS VARCHAR) || '-W' ||
        |    lpad(CAST(weekofyear(date_actual) AS VARCHAR), 2, '0') AS week_of_year_iso,
        |  CAST(month(date_actual) AS INT) AS month_actual,
        |  monthname(date_actual) AS month_name,
        |  strftime(date_actual, '%b') AS month_name_abbreviated,
        |  CAST(quarter(date_actual) AS INT) AS quarter_actual,
        |  CASE CAST(quarter(date_actual) AS INT)
        |    WHEN 1 THEN 'First' WHEN 2 THEN 'Second' WHEN 3 THEN 'Third'
        |    ELSE 'Fourth' END AS quarter_name,
        |  CAST(year(date_actual) AS INT) AS year_actual,
        |  CAST(date_actual - CAST(isodow(date_actual) - 1 AS INT) AS VARCHAR) AS first_day_of_week,
        |  CAST(date_actual - CAST(isodow(date_actual) - 1 AS INT) + 6 AS VARCHAR) AS last_day_of_week,
        |  CAST(CAST(date_trunc('month', date_actual) AS DATE) AS VARCHAR) AS first_day_of_month,
        |  CAST(last_day(date_actual) AS VARCHAR) AS last_day_of_month,
        |  CAST(CAST(date_trunc('quarter', date_actual) AS DATE) AS VARCHAR) AS first_day_of_quarter,
        |  CAST(CAST(date_trunc('quarter', date_actual) + INTERVAL 3 MONTH - INTERVAL 1 DAY AS DATE) AS VARCHAR) AS last_day_of_quarter,
        |  CAST(CAST(date_trunc('year', date_actual) AS DATE) AS VARCHAR) AS first_day_of_year,
        |  CAST(make_date(CAST(year(date_actual) AS INT), 12, 31) AS VARCHAR) AS last_day_of_year,
        |  strftime(date_actual, '%m%Y') AS mmyyyy,
        |  strftime(date_actual, '%m%d%Y') AS mmddyyyy,
        |  CASE WHEN isodow(date_actual) IN (6,7) THEN 'weekend' ELSE 'weekday' END AS weekend_indr
        |FROM d ORDER BY date_id""".stripMargin
  )
}
