package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.streaming.EventsStream

/** Streaming-transform coverage (SURVEY §2.8 extension). The transforms
  * are stream/batch agnostic; the oracle checks them in batch mode over
  * the same events table (stream-vs-batch parity itself is asserted by
  * StreamingSpec with Trigger.AvailableNow). Timestamps are surfaced as
  * epoch microseconds to dodge cross-engine text formatting. */
object StreamingQueries {

  private def batchEvents(s: SparkSession, d: String): DataFrame =
    EventsStream.withEventTime(events(s, d))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // watermark+window rollup (batch-parity form).
    "b1_windowed_rollup" -> { (s, d) =>
      EventsStream.windowedRollup(batchEvents(s, d))
        .orderBy(col("window_start_us"), col("event_type"))
    },

    // gap-based sessionization via built-in session_window.
    "b2_session_rollup" -> { (s, d) =>
      EventsStream.sessionRollup(batchEvents(s, d))
        .orderBy(col("user_id"), col("session_start_us"))
    },

    // custom keyed state (mapGroupsWithState) — running per-user totals;
    // cent-exact accumulation so the result is order-independent.
    "b3_user_running_totals" -> { (s, d) =>
      import s.implicits._
      val typed = batchEvents(s, d)
        .select(col("user_id"), col("event_time"), col("value"))
        .as[EventsStream.UserEvent]
      EventsStream.userRunningTotals(typed).toDF()
        .orderBy(col("user_id"))
    },

    // stream-stream interval self-join (purchase→view attribution),
    // batch-parity form; the watermarked two-leg streaming run of the
    // same join is asserted equal in StreamingSpec.
    "b5_attribution_join" -> { (s, d) =>
      EventsStream.attributionJoin(batchEvents(s, d), lookback = "1 hour")
        .orderBy(col("user_id"), col("purchase_id"), col("view_id"))
    },

    // streaming keyed dedup (dropDuplicates + watermark), batch-parity
    // form — key columns only, so the surviving row set is deterministic
    // regardless of which physical duplicate arrives first; the
    // multi-batch streaming run is asserted equal in
    // SketchStreamDedupSpec.
    "b6_stream_dedup" -> { (s, d) =>
      EventsStream.dedupByKey(
        batchEvents(s, d).select(col("user_id"), col("event_type"),
          col("event_time")),
        Seq("user_id", "event_type"))
        .select(col("user_id"), col("event_type"),
          unix_micros(col("event_time")).as("event_time_us"))
        .orderBy(col("user_id"), col("event_type"), col("event_time_us"))
    },

    // watermark-dropped late data (b7): the batch-parity MODEL of what a
    // watermarked streaming windowedRollup keeps when the input arrives
    // as 4 ordered micro-batches (batch = event_id mod 4) — the
    // late-events watermark for batch b is max event time of batches
    // 0..b-2 minus 2h (one batch behind eviction, the SPARK-40925
    // split), rows in already-final windows are dropped. The actual
    // multi-batch streaming
    // run (per-file micro-batches + sentinel flush) is asserted equal to
    // this model in StreamingSpec.
    "b7_late_data" -> { (s, d) =>
      EventsStream.lateKeptRollup(batchEvents(s, d))
        .orderBy(col("window_start_us"), col("event_type"))
    },

    // the streaming upsert sink's merge step (latest row per key by
    // version), batch-parity form — the multi-batch streaming run of the
    // same fold is asserted equal in StreamingSpec.
    "b4_latest_snapshot" -> { (s, d) =>
      val ev = events(s, d).select(
        col("user_id"), col("event_id"), col("event_type"), col("value"))
      graft.sources.JdbcUpsert.mergeByKey(
        ev.limit(0), ev, Seq("user_id"), "event_id")
        .orderBy(col("user_id"))
    }
  )

  val oracle: Map[String, String] = Map(
    "b1_windowed_rollup" ->
      """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS window_start_us,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY window_start_us, event_type""".stripMargin,
    "b2_session_rollup" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS t, value FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN lag(t) OVER w IS NULL
        |                  OR t - lag(t) OVER w >= INTERVAL 30 MINUTE
        |             THEN 1 ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        |sessions AS (
        |  SELECT *, sum(new_session) OVER
        |    (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT epoch_us(min(t)) AS session_start_us, user_id,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,
    "b7_late_data" ->
      """WITH e AS (
        |  SELECT event_id % 4 AS b, event_type, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |w AS (
        |  SELECT *, (us // 3600000000 + 1) * 3600000000 AS win_end_us FROM e),
        |bm AS (SELECT b, max(us) AS bmax_us FROM w GROUP BY b),
        |wm AS (
        |  SELECT b, greatest(coalesce(
        |    (max(bmax_us) OVER (ORDER BY b
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)) // 1000
        |      - 7200000, 0), 0) AS wm_ms
        |  FROM bm),
        |kept AS (
        |  SELECT w.* FROM w JOIN wm USING (b)
        |  WHERE w.win_end_us // 1000 > wm.wm_ms)
        |SELECT win_end_us - 3600000000 AS window_start_us, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM kept GROUP BY 1, 2 ORDER BY window_start_us, event_type""".stripMargin,
    "b3_user_running_totals" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value,
        |  max(value) AS max_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "b6_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS event_time_us
        |FROM events
        |ORDER BY user_id, event_type, event_time_us""".stripMargin,
    "b4_latest_snapshot" ->
      """SELECT user_id, event_id, event_type, value
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,
    // b5: timestamps truncate to micros on both engines (Spark: ts div
    // 1000; DuckDB: TIMESTAMP_NS -> TIMESTAMP cast), so the interval
    // boundary comparisons agree exactly.
    "b5_attribution_join" ->
      """SELECT l.user_id, l.event_id AS purchase_id, r.event_id AS view_id,
        |  epoch_us(CAST(l.ts AS TIMESTAMP)) - epoch_us(CAST(r.ts AS TIMESTAMP)) AS gap_us
        |FROM events l JOIN events r ON l.user_id = r.user_id
        |WHERE l.event_type = 'purchase' AND r.event_type = 'view'
        |  AND CAST(r.ts AS TIMESTAMP) <= CAST(l.ts AS TIMESTAMP)
        |  AND CAST(r.ts AS TIMESTAMP) >= CAST(l.ts AS TIMESTAMP) - INTERVAL 1 HOUR
        |ORDER BY 1, 2, 3""".stripMargin
  )
}
