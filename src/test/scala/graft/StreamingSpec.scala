package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventsStream

/** Stream/batch parity with Trigger.AvailableNow over the real events
  * parquet — same transform, same result, exactly-once file-source
  * semantics standing in for the reference's daily re-extract. */
class StreamingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The file stream source wants a directory; the testdata table is a
    * single parquet file — stage a copy. */
  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("part-0.parquet"))
    d.toString
  }

  private def norm(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("windowed rollup: AvailableNow stream == batch") {
    val streamed = EventsStream.runAvailableNow(spark, streamDir,
      EventsStream.windowedRollup(_), "win_rollup", OutputMode.Complete())
    val batch = EventsStream.windowedRollup(
      EventsStream.withEventTime(graft.Tables.events(spark, dir)))
    assert(norm(streamed) == norm(batch))
    assert(streamed.count() > 0)
  }

  test("session rollup: AvailableNow stream == batch") {
    val streamed = EventsStream.runAvailableNow(spark, streamDir,
      EventsStream.sessionRollup(_), "sess_rollup", OutputMode.Complete())
    val batch = EventsStream.sessionRollup(
      EventsStream.withEventTime(graft.Tables.events(spark, dir)))
    assert(norm(streamed) == norm(batch))
  }

  test("mapGroupsWithState running totals match a plain aggregate") {
    import spark.implicits._
    val typed = EventsStream.withEventTime(graft.Tables.events(spark, dir))
      .select(col("user_id"), col("event_time"), col("value"))
      .as[EventsStream.UserEvent]
    val got = EventsStream.userRunningTotals(typed).collect()
      .map(s => s.user_id -> ((s.n_events, s.total_value, s.max_value))).toMap
    val want = graft.Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("t"),
        max(col("value")).as("m"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got == want)
  }

  test("upsert snapshot sink: multi-batch stream == latest-per-key batch") {
    // stage events as MULTIPLE files so maxFilesPerTrigger=4 yields
    // several micro-batches (batch-boundary independence is the claim)
    val src = java.nio.file.Files.createTempDirectory("events_many").toString
    graft.Tables.events(spark, dir).repartition(9)
      .write.mode("overwrite").parquet(src)
    val snapDir = java.nio.file.Files.createTempDirectory("snap").toString + "/current"
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val q = EventsStream.upsertSnapshotSink(
      EventsStream.readEvents(spark, src),
      keyCols = Seq("user_id"), versionCol = "event_id",
      snapshotDir = snapDir, checkpointDir = ckpt)
    q.awaitTermination()
    assert(q.recentProgress.length > 1, "expected multiple micro-batches")
    val snapshot = spark.read.parquet(snapDir)
      .select("user_id", "event_id", "event_type")
    val batch = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      EventsStream.withEventTime(graft.Tables.events(spark, dir))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)))
        .filter(col("__rn") === 1)
        .select("user_id", "event_id", "event_type")
    }
    assert(norm(snapshot) == norm(batch))
    assert(snapshot.count() > 0)
  }
}
