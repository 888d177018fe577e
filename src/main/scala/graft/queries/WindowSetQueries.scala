package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Window-function, rollup, set-operation, and SQL-surface coverage —
  * operator families an analytics engine must carry even though the
  * reference itself never uses them (SURVEY §2.5 notes them absent). */
object WindowSetQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // rank / lag / running sum over per-customer order history.
    "w2_window_suite" -> { (s, d) =>
      val byCust = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val running = byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        rank().over(byCust).as("order_rank"),
        lag(col("o_totalprice").cast("decimal(18,2)"), 1).over(byCust)
          .cast("double").as("prev_price"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(running)
          .cast("double").as("running_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // SCD Type-2 dimension build from a change log: the events table as
    // per-user status transitions — consecutive-duplicate collapse,
    // half-open effective intervals, version ordinals, current flag.
    "w4_scd2_dim" -> { (s, d) =>
      val ev = graft.streaming.EventsStream.withEventTime(events(s, d))
        .select(col("user_id"), col("event_type").as("status"),
          col("event_time"), col("event_id"))
      graft.operators.Warehouse.scd2(ev, Seq("user_id"), Seq("status"),
        "event_time", tieBreak = Seq("event_id"))
        .select(col("user_id"), col("status"), col("version"),
          unix_micros(col("effective_from")).as("eff_from_us"),
          unix_micros(col("effective_to")).as("eff_to_us"),
          col("is_current"))
        .orderBy(col("user_id"), col("version"))
    },

    // rollup over region/nation with grouping ids.
    "w3_rollup" -> { (s, d) =>
      val c = customer(s, d)
      val n = nation(s, d)
      val r = region(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("total_bal"),
          grouping_id().cast("int").as("gid"))
        .orderBy(col("gid"), col("r_name"), col("n_name"))
    },

    // cube over (region, market segment) — all four grouping sets, the
    // rollup's sibling the reference also lacks.
    "w5_cube" -> { (s, d) =>
      val c = customer(s, d)
      val n = nation(s, d)
      val r = region(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .cube(col("r_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("total_bal"),
          grouping_id().cast("int").as("gid"))
        .orderBy(col("gid"), col("r_name"), col("c_mktsegment"))
    },

    // set operations with SQL set semantics (distinct).
    "so1_set_ops" -> { (s, d) =>
      val purchasers = orders(s, d).filter(col("o_totalprice") > 50000)
        .select(col("o_custkey").as("k"))
      val machinery = customer(s, d).filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey").as("k"))
      val inter  = purchasers.intersect(machinery)
        .withColumn("op", lit("intersect"))
      val except = machinery.except(purchasers)
        .withColumn("op", lit("except"))
      inter.unionByName(except).orderBy(col("op"), col("k"))
    },

    // bag-semantics set ops (INTERSECT ALL / EXCEPT ALL): multiplicities
    // carry through — a customer with 3 qualifying orders vs 1 matching
    // row survives EXCEPT ALL twice, where so1's DISTINCT forms collapse.
    "so2_set_ops_all" -> { (s, d) =>
      val purchasers = orders(s, d).filter(col("o_totalprice") > 50000)
        .select(col("o_custkey").as("k"))
      val machinery = customer(s, d).filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey").as("k"))
      val inter  = purchasers.intersectAll(machinery)
        .withColumn("op", lit("intersect_all"))
      val except = purchasers.exceptAll(machinery)
        .withColumn("op", lit("except_all"))
      inter.unionByName(except)
        .groupBy(col("op"), col("k")).agg(count(lit(1)).as("multiplicity"))
        .orderBy(col("op"), col("k"))
    },

    // window distribution functions over per-customer order history
    // (PARTITIONED window — keyed like w2, never a global single-task
    // sort): quartile buckets, relative rank, cumulative distribution.
    "w6_window_dist" -> { (s, d) =>
      val byCust = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").cast("decimal(18,2)"), col("o_orderkey"))
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          ntile(4).over(byCust).as("quartile"),
          round(percent_rank().over(byCust), 9).as("pr"),
          round(cume_dist().over(byCust), 9).as("cd"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // correlated scalar subquery + EXISTS through the SQL surface.
    "sq1_scalar_subquery" -> { (s, d) =>
      graft.core.Catalog.register(s, d)
      s.sql("""
        SELECT c_custkey,
               (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
               CAST((SELECT max(o_totalprice) FROM orders o
                     WHERE o.o_custkey = c.c_custkey) AS DOUBLE) AS max_order
        FROM customer c
        WHERE c_custkey % 7 = 0
        ORDER BY c_custkey""")
    },

    // null-semantics suite: null-safe equality, coalesce/nullif/nvl2.
    "nl1_null_semantics" -> { (s, d) =>
      val a = when(col("c_custkey") % 3 === 0, lit(null).cast("string"))
        .otherwise(col("c_mktsegment"))
      val b = when(col("c_custkey") % 4 === 0, lit(null).cast("string"))
        .otherwise(col("c_mktsegment"))
      customer(s, d).select(
        col("c_custkey"), a.as("a"), b.as("b"),
        (a <=> b).as("null_safe_eq"),
        coalesce(a, b, lit("neither")).as("coalesced"),
        nullif(a, b).as("nullif_ab"),
        when(a.isNull, lit("was_null")).otherwise(concat(lit("seg:"), a)).as("branched"))
        .orderBy(col("c_custkey"))
    },

    // SQL surface: the same engine tables through spark.sql.
    "sql1_catalog_query" -> { (s, d) =>
      graft.core.Catalog.register(s, d)
      s.sql("""
        SELECT c_mktsegment,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")
    }
  )

  val oracle: Map[String, String] = Map(
    "w2_window_suite" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(rank() OVER w AS INT) AS order_rank,
        |  CAST(lag(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER w AS DOUBLE) AS prev_price,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // w4: the full SCD2 construction in SQL — transition filter (null-safe
    // against the previous row), per-key version ordinals, lead() interval
    // close-off, current flag. Timestamps surfaced as epoch micros.
    "w4_scd2_dim" ->
      """WITH e AS (
        |  SELECT user_id, event_type AS status, CAST(ts AS TIMESTAMP) AS t,
        |    event_id
        |  FROM events),
        |m AS (
        |  SELECT *, lag(status) OVER w AS prev_status,
        |    (lag(t) OVER w IS NULL) AS is_first
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |v AS (
        |  SELECT user_id, status, t, event_id FROM m
        |  WHERE is_first OR status IS DISTINCT FROM prev_status)
        |SELECT user_id, status,
        |  CAST(row_number() OVER w2 AS INT) AS version,
        |  epoch_us(t) AS eff_from_us,
        |  epoch_us(lead(t) OVER w2) AS eff_to_us,
        |  (lead(t) OVER w2 IS NULL) AS is_current
        |FROM v WINDOW w2 AS (PARTITION BY user_id ORDER BY t, event_id)
        |ORDER BY user_id, version""".stripMargin,
    "w3_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
        |  CAST(grouping(r_name) * 2 + grouping(n_name) AS INT) AS gid
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "so2_set_ops_all" ->
      """SELECT * FROM (
        |  SELECT 'intersect_all' AS op, k, count(*) AS multiplicity FROM (
        |    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 50000
        |    INTERSECT ALL
        |    SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'MACHINERY')
        |  GROUP BY k
        |  UNION ALL
        |  SELECT 'except_all' AS op, k, count(*) AS multiplicity FROM (
        |    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 50000
        |    EXCEPT ALL
        |    SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'MACHINERY')
        |  GROUP BY k)
        |ORDER BY op, k""".stripMargin,
    "w6_window_dist" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  round(percent_rank() OVER w, 9) AS pr,
        |  round(cume_dist() OVER w, 9) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "w5_cube" ->
      """SELECT r_name, c_mktsegment, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
        |  CAST(grouping(r_name) * 2 + grouping(c_mktsegment) AS INT) AS gid
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY CUBE (r_name, c_mktsegment)
        |ORDER BY gid, r_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,
    "so1_set_ops" ->
      """SELECT * FROM (
        |  SELECT k, 'intersect' AS op FROM (
        |    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 50000
        |    INTERSECT
        |    SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'MACHINERY')
        |  UNION ALL
        |  SELECT k, 'except' AS op FROM (
        |    SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'MACHINERY'
        |    EXCEPT
        |    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 50000))
        |ORDER BY op, k""".stripMargin,
    "sq1_scalar_subquery" ->
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  CAST((SELECT max(o_totalprice) FROM orders o
        |        WHERE o.o_custkey = c.c_custkey) AS DOUBLE) AS max_order
        |FROM customer c WHERE c_custkey % 7 = 0 ORDER BY c_custkey""".stripMargin,
    "nl1_null_semantics" ->
      """WITH src AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_mktsegment END AS a,
        |    CASE WHEN c_custkey % 4 = 0 THEN NULL ELSE c_mktsegment END AS b
        |  FROM customer)
        |SELECT c_custkey, a, b,
        |  a IS NOT DISTINCT FROM b AS null_safe_eq,
        |  coalesce(a, b, 'neither') AS coalesced,
        |  nullif(a, b) AS nullif_ab,
        |  CASE WHEN a IS NULL THEN 'was_null' ELSE 'seg:' || a END AS branched
        |FROM src ORDER BY c_custkey""".stripMargin,
    "sql1_catalog_query" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  )
}
