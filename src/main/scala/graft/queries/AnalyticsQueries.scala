package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.{AsOf, RangeJoin}
import graft.streaming.EventsStream

/** Analytics-operator coverage beyond the reference: as-of join (the
  * engine's composed implementation cross-checked against DuckDB's
  * NATIVE ASOF JOIN), pivot, and exact percentiles/distinct counts. */
object AnalyticsQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // as-of join: each event gets the user's most recent prior "profile
    // update" (every 10th event acts as an update).
    "ao1_asof_join" -> { (s, d) =>
      val ev = EventsStream.withEventTime(events(s, d))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("event_time")).as("t"), col("event_type"))
      val updates = ev.filter(col("event_id") % 10 === 0)
        .select(col("user_id"), col("t"),
          concat(lit("v"), col("event_id")).as("profile_version"))
      AsOf.join(ev, updates, Seq("user_id"), "t", Seq("profile_version"))
        .orderBy(col("event_id"))
    },

    // forward as-of with a 60 s tolerance (pandas merge_asof surface):
    // earliest update AT/after each event, match nulled beyond bound.
    "ao2_asof_forward" -> { (s, d) =>
      val ev = EventsStream.withEventTime(events(s, d))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("event_time")).as("t"), col("event_type"))
      val updates = ev.filter(col("event_id") % 10 === 0)
        .select(col("user_id"), col("t"),
          concat(lit("v"), col("event_id")).as("profile_version"))
      AsOf.join(ev, updates, Seq("user_id"), "t", Seq("profile_version"),
        AsOf.Forward, Some(60L * 1000000))
        .orderBy(col("event_id"))
    },

    // bucketized range join: events against 30-minute activity windows
    // opened by every 20th event (equi-join on (user, bucket) + residual
    // BETWEEN — never a nested-loop range join).
    "rq1_range_join" -> { (s, d) =>
      val ev = EventsStream.withEventTime(events(s, d))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("event_time")).as("t"))
      val windows = ev.filter(col("event_id") % 20 === 0)
        .select(col("user_id"), col("event_id").as("window_id"),
          col("t").as("w_start"), (col("t") + 30L * 60 * 1000000).as("w_end"))
      RangeJoin.pointInInterval(ev, windows, Seq("user_id"), "t",
          "w_start", "w_end", bucketWidth = 30L * 60 * 1000000)
        .select(col("window_id"), col("event_id"))
        .orderBy(col("window_id"), col("event_id"))
    },

    // pivot: order counts per status × priority (explicit value list so
    // the output schema is fixed).
    "pv1_pivot" -> { (s, d) =>
      val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      orders(s, d)
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority", priorities)
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("o_orderstatus"))
    },

    // unpivot/melt — pv1's inverse: the wide per-status priority counts
    // back to long (status, priority, n) form via Dataset.unpivot
    // (SQL UNPIVOT / pandas melt surface).
    "up1_unpivot" -> { (s, d) =>
      val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val wide = orders(s, d)
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority", priorities)
        .agg(count(lit(1)))
        .na.fill(0L)
      wide.unpivot(
        Array(col("o_orderstatus")),
        priorities.map(col).toArray,
        "priority", "n")
        .orderBy(col("o_orderstatus"), col("priority"))
    },

    // sketch aggregates (HLL distinct, approximate percentile). The raw
    // sketch values are not DuckDB-reproducible (different sketch
    // impls), so the gate asserts the PUBLISHED ERROR BOUNDS by
    // construction: Spark emits each bound check as a boolean next to
    // the exact aggregates; the oracle emits the same exact aggregates
    // (cross-checked for real) plus literal TRUEs. A sketch regression
    // flips a boolean and fails the hash compare. Bounds: HLL++ default
    // relativeSD 0.05 -> 3-sigma 15%; percentile_approx accuracy 1000 ->
    // rank error <= 1/1000, asserted generously as "approx median lies
    // between the exact 0.49 and 0.51 quantiles".
    "sk1_sketches" -> { (s, d) =>
      lineitem(s, d).agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        approx_count_distinct(col("l_partkey")).as("__hll_parts"),
        approx_count_distinct(col("l_orderkey")).as("__hll_orders"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("__amed"),
        percentile(col("l_quantity"), lit(0.49)).as("__q49"),
        percentile(col("l_quantity"), lit(0.51)).as("__q51"))
        .select(col("exact_parts"), col("exact_orders"),
          (abs(col("__hll_parts") - col("exact_parts")) <=
            col("exact_parts") * 0.15).as("hll_parts_ok"),
          (abs(col("__hll_orders") - col("exact_orders")) <=
            col("exact_orders") * 0.15).as("hll_orders_ok"),
          (col("__amed") >= col("__q49") && col("__amed") <= col("__q51"))
            .as("median_ok"))
    },

    // MapType round-trip (SURVEY §1.2 JSONB-analog): per-user counts
    // built into a map<event_type, n>, then exploded back to rows — the
    // map structure is exercised end-to-end while the compared output
    // stays engine-neutral.
    "mp1_map_type" -> { (s, d) =>
      events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("user_id"))
        .agg(map_from_entries(collect_list(struct(col("event_type"), col("n")))).as("m"))
        .select(col("user_id"), explode(col("m")).as(Seq("event_type", "n")))
        .orderBy(col("user_id"), col("event_type"))
    },

    // salted two-stage aggregation over a hot key (5 event types x 20%
    // of the table each): results must be IDENTICAL to the plain
    // groupBy — the oracle is the unsalted SQL. Long sums only (exact,
    // associative — a double sum would expose re-association order).
    "sw1_salted_agg" -> { (s, d) =>
      graft.operators.Skew.saltedAggregate(events(s, d), "event_type",
        Map("sum_event_id" -> col("event_id"), "sum_user_id" -> col("user_id")),
        saltSource = col("event_id"), salts = 16)
        .orderBy(col("event_type"))
    },

    // salted replicated-build join against a 5-row weight dim, rolled
    // up per type — transparency vs the plain join is the check.
    "sw2_salted_join" -> { (s, d) =>
      import s.implicits._
      val dim = Seq(("click", 1L), ("view", 2L), ("signup", 3L),
        ("purchase", 4L), ("error", 5L)).toDF("event_type", "weight")
      graft.operators.Skew.saltedJoin(events(s, d), dim, Seq("event_type"),
        saltSource = col("event_id"), salts = 8)
        .groupBy(col("event_type"), col("weight"))
        .agg(count(lit(1)).as("n"), sum(col("user_id") * col("weight")).as("wsum"))
        .orderBy(col("event_type"))
    },

    // exact percentiles (linear interpolation) + exact distinct counts.
    "pc1_percentiles" -> { (s, d) =>
      lineitem(s, d).agg(
        element_at(percentile(col("l_quantity"), array(lit(0.25), lit(0.5), lit(0.75))), 1).as("q25"),
        element_at(percentile(col("l_quantity"), array(lit(0.25), lit(0.5), lit(0.75))), 2).as("q50"),
        element_at(percentile(col("l_quantity"), array(lit(0.25), lit(0.5), lit(0.75))), 3).as("q75"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
    }
  )

  val oracle: Map[String, String] = Map(
    "ao1_asof_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS t, event_type
        |  FROM events),
        |updates AS (
        |  SELECT user_id, t, 'v' || event_id AS profile_version
        |  FROM ev WHERE event_id % 10 = 0)
        |SELECT ev.event_id, ev.user_id, ev.t, ev.event_type,
        |  u.profile_version AS asof_profile_version
        |FROM ev ASOF LEFT JOIN updates u
        |  ON ev.user_id = u.user_id AND ev.t >= u.t
        |ORDER BY event_id""".stripMargin,
    "ao2_asof_forward" ->
      """WITH ev AS (
        |  SELECT event_id, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS t, event_type
        |  FROM events),
        |updates AS (
        |  SELECT user_id, t, 'v' || event_id AS profile_version
        |  FROM ev WHERE event_id % 10 = 0)
        |SELECT ev.event_id, ev.user_id, ev.t, ev.event_type,
        |  CASE WHEN u.t - ev.t <= 60000000 THEN u.profile_version END
        |    AS asof_profile_version
        |FROM ev ASOF LEFT JOIN updates u
        |  ON ev.user_id = u.user_id AND ev.t <= u.t
        |ORDER BY event_id""".stripMargin,

    "rq1_range_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
        |  FROM events),
        |w AS (
        |  SELECT user_id, event_id AS window_id, t AS w_start,
        |    t + 30 * 60 * 1000000 AS w_end
        |  FROM ev WHERE event_id % 20 = 0)
        |SELECT w.window_id, ev.event_id
        |FROM ev JOIN w ON ev.user_id = w.user_id
        |  AND ev.t BETWEEN w.w_start AND w.w_end
        |ORDER BY window_id, event_id""".stripMargin,
    "pv1_pivot" ->
      """SELECT o_orderstatus,
        |  CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS "1-URGENT",
        |  CAST(count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS "2-HIGH",
        |  CAST(count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS "3-MEDIUM",
        |  CAST(count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS "4-NOT SPECIFIED",
        |  CAST(count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS "5-LOW"
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // up1: the melt re-derived long-form — all 5 priorities per status,
    // zero-filled like the engine's na.fill(0) wide table.
    "up1_unpivot" ->
      """WITH s AS (SELECT DISTINCT o_orderstatus FROM orders),
        |p AS (SELECT * FROM (VALUES ('1-URGENT'), ('2-HIGH'), ('3-MEDIUM'),
        |  ('4-NOT SPECIFIED'), ('5-LOW')) t(priority)),
        |c AS (SELECT o_orderstatus, o_orderpriority AS priority, count(*) AS n
        |      FROM orders GROUP BY 1, 2)
        |SELECT s.o_orderstatus, p.priority, COALESCE(c.n, 0) AS n
        |FROM s CROSS JOIN p
        |LEFT JOIN c ON c.o_orderstatus = s.o_orderstatus AND c.priority = p.priority
        |ORDER BY s.o_orderstatus, p.priority""".stripMargin,
    "mp1_map_type" ->
      """SELECT user_id, event_type, count(*) AS n
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "sw1_salted_agg" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(event_id) AS BIGINT) AS sum_event_id,
        |  CAST(sum(user_id) AS BIGINT) AS sum_user_id
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "sw2_salted_join" ->
      """WITH dim(event_type, weight) AS (VALUES
        |  ('click', 1), ('view', 2), ('signup', 3), ('purchase', 4), ('error', 5))
        |SELECT e.event_type, CAST(d.weight AS BIGINT) AS weight,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(e.user_id * d.weight) AS BIGINT) AS wsum
        |FROM events e JOIN dim d USING (event_type)
        |GROUP BY e.event_type, d.weight ORDER BY e.event_type""".stripMargin,

    // the exact columns are genuinely cross-checked; the *_ok booleans
    // are TRUE literals here because only Spark can see its own sketch
    // values — Spark computes the bound check, so a drifted sketch
    // flips its boolean and hash-mismatches against these TRUEs.
    "sk1_sketches" ->
      """SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        |  TRUE AS hll_parts_ok, TRUE AS hll_orders_ok, TRUE AS median_ok
        |FROM lineitem""".stripMargin,
    "pc1_percentiles" ->
      """SELECT quantile_cont(l_quantity, 0.25) AS q25,
        |  quantile_cont(l_quantity, 0.5) AS q50,
        |  quantile_cont(l_quantity, 0.75) AS q75,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem""".stripMargin
  )
}
