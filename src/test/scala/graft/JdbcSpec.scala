package graft

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.functions._
import graft.sources.{Readers, Writers}

/** Live JDBC integration against embedded Derby (ships with Spark):
  * S5 append sink round-trips through S1 scans, plain and partitioned.
  * (Derby has no ON CONFLICT, so the Postgres upsert path is covered by
  * statement-shape tests in SourcesSpec instead.) */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private lazy val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  test("jdbc append + read round-trip (plain and partitioned scan)") {
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        "CREATE TABLE companies (id BIGINT, name VARCHAR(64), bal DECIMAL(18,2))")
    } finally conn.close()

    val df = (1L to 100L).map(i => (i, s"company_$i", BigDecimal(i * 10, 2)))
      .toDF("id", "name", "bal")
      .select($"id", $"name", $"bal".cast("decimal(18,2)").as("bal"))
    Writers.jdbcAppend(df, url, "companies", props, connections = 2)

    val plain = Readers.jdbc(spark, url, "companies", props)
    assert(plain.count() == 100)
    assert(plain.filter($"id" === 42L).select("name").collect()(0).getString(0) == "company_42")

    // partitioned range scan: 4 concurrent range predicates
    val parts = Readers.jdbc(spark, url, "companies", props,
      partitionOn = Some(("id", 1L, 100L, 4)))
    assert(parts.rdd.getNumPartitions == 4)
    assert(parts.count() == 100)
    assert(parts.agg(sum($"bal")).collect()(0).getDecimal(0) ==
      plain.agg(sum($"bal")).collect()(0).getDecimal(0))
  }

  test("jdbc subquery pushdown (derived-table scan, reference S1 shape)") {
    val sub = Readers.jdbc(spark, url,
      "(SELECT id, name FROM companies WHERE id <= 10) data", props)
    assert(sub.count() == 10)
    assert(sub.columns.toSeq == Seq("ID", "NAME"))
  }
}
