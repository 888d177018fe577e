package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Standalone join-shape coverage beyond the warehouse builds: semi/anti
  * (EXISTS / NOT EXISTS) and USING-style joins (SURVEY §2.3; Spark guide
  * join idioms). All dims broadcast — the probe side never shuffles. */
object JoinQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // left_semi = EXISTS: orders having at least one heavy line.
    "j_semi_exists" -> { (s, d) =>
      val heavy = lineitem(s, d).filter(col("l_quantity") > 49)
      val o = orders(s, d)
      o.join(heavy, o("o_orderkey") === heavy("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    },

    // left_anti = NOT EXISTS: customers with no orders.
    "j_anti_not_exists" -> { (s, d) =>
      val o = orders(s, d)
      val c = customer(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // USING-style single-key equi-join with the deduplicated key column
    // (reference J5 pattern: `on="funding_round_id"`).
    "j_using_left" -> { (s, d) =>
      val li = lineitem(s, d).select(col("l_orderkey").as("okey"),
        col("l_linenumber"), col("l_quantity"))
      val o = orders(s, d).select(col("o_orderkey").as("okey"), col("o_orderstatus"))
      // (okey, l_linenumber) is not unique in the synthetic lineitem —
      // order by every column for a deterministic compare.
      li.join(o, Seq("okey"), "left")
        .orderBy(col("okey"), col("l_linenumber"), col("l_quantity"), col("o_orderstatus"))
    },

    // multi-way broadcast star join with grouped agg (the flagship shape,
    // parameterized by sf dir for the oracle).
    "star_join_revenue" -> { (s, d) =>
      val li = lineitem(s, d)
      val o = orders(s, d)
      val c = customer(s, d)
      val n = nation(s, d)
      val r = region(s, d)
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
    },

    // FULL OUTER join: big-order customers vs MACHINERY customers —
    // both one-sided populations survive, with a side tag derived from
    // explicit IS NOT NULL checks (no three-valued-logic surprises).
    "jf1_full_outer" -> { (s, d) =>
      val big = orders(s, d).filter(col("o_totalprice") > 150000)
        .select(col("o_custkey").as("k"))
        .groupBy("k").agg(count(lit(1)).as("n_big_orders"))
      val mach = customer(s, d).filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey").as("k"),
          col("c_acctbal").cast("decimal(18,2)").cast("double").as("bal"),
          lit(true).as("__c"))
      big.join(mach, Seq("k"), "full_outer")
        .select(col("k"),
          coalesce(col("n_big_orders"), lit(0L)).as("n_big_orders"),
          col("bal"),
          when(col("n_big_orders").isNotNull && col("__c").isNotNull, "both")
            .when(col("n_big_orders").isNotNull, "orders_only")
            .otherwise("customer_only").as("side"))
        .orderBy(col("k"))
    }
  )

  val oracle: Map[String, String] = Map(
    "jf1_full_outer" ->
      """WITH big AS (
        |  SELECT o_custkey AS k, count(*) AS n_big_orders
        |  FROM orders WHERE o_totalprice > 150000 GROUP BY 1),
        |mach AS (
        |  SELECT c_custkey AS k,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal,
        |    TRUE AS c
        |  FROM customer WHERE c_mktsegment = 'MACHINERY')
        |SELECT COALESCE(big.k, mach.k) AS k,
        |  COALESCE(n_big_orders, 0) AS n_big_orders, bal,
        |  CASE WHEN n_big_orders IS NOT NULL AND c IS NOT NULL THEN 'both'
        |       WHEN n_big_orders IS NOT NULL THEN 'orders_only'
        |       ELSE 'customer_only' END AS side
        |FROM big FULL OUTER JOIN mach ON big.k = mach.k
        |ORDER BY k""".stripMargin,
    "j_semi_exists" ->
      """SELECT o_orderkey, o_orderstatus FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49)
        |ORDER BY o_orderkey""".stripMargin,
    "j_anti_not_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "j_using_left" ->
      """SELECT li.okey, li.l_linenumber, li.l_quantity, o.o_orderstatus
        |FROM (SELECT l_orderkey AS okey, l_linenumber, l_quantity FROM lineitem) li
        |LEFT JOIN (SELECT o_orderkey AS okey, o_orderstatus FROM orders) o USING (okey)
        |ORDER BY okey, l_linenumber, l_quantity, o_orderstatus NULLS FIRST""".stripMargin,
    "star_join_revenue" ->
      """SELECT r_name,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin
  )
}
