package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.EventsStream

/** Anatomy probe for the b7 late-data gate: stages the events table as
  * per-batch files (batch = event_id mod 4, plus a far-future sentinel),
  * runs the watermarked streaming rollup, and prints per micro-batch the
  * REAL watermark Spark used, its numRowsDroppedByWatermark, and the
  * model's prediction — so a divergence between
  * [[EventsStream.lateKeptRollup]] and Spark's contract is attributable
  * to a specific batch and a specific watermark value, not a diff of 400
  * output rows. Usage: tools/run-main.sh graft.tools.LateDataProbe [sfDir]
  */
object LateDataProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val raw = spark.read.parquet(s"$dir/events.parquet")
    val src = java.nio.file.Files.createTempDirectory("ev_late_probe").toString
    val stage = java.nio.file.Files.createTempDirectory("ev_late_probe_st").toString
    val base = System.currentTimeMillis() - 3600 * 1000L
    def placeFile(fromDir: String, name: String, mtime: Long): Unit = {
      val part = new java.io.File(fromDir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(src, name)
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      require(dst.setLastModified(mtime))
    }
    (0 until 4).foreach { b =>
      raw.filter(pmod(col("event_id"), lit(4)) === b).coalesce(1)
        .write.mode("overwrite").parquet(s"$stage/b$b")
      placeFile(s"$stage/b$b", f"batch-$b%03d.parquet", base + b * 60000L)
    }
    val tenYearsUs = 3650L * 24 * 3600 * 1000000L
    val sentinel = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.limit(1).withColumn("ts",
          lit(raw.agg(max(col("ts"))).head.getLong(0) + tenYearsUs * 1000L))
      case _ =>
        val maxUs = raw.agg(max(unix_micros(col("ts").cast("timestamp"))))
          .head.getLong(0)
        raw.limit(1).withColumn("ts",
          timestamp_micros(lit(maxUs + tenYearsUs)).cast(raw.schema("ts").dataType))
    }
    sentinel.withColumn("event_type", lit("sentinel")).coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/sent")
    placeFile(s"$stage/sent", "batch-999.parquet", base + 10 * 60000L)

    val q = EventsStream.windowedRollup(
      EventsStream.withEventTime(
        spark.readStream.schema(spark.read.parquet(src).schema)
          .option("maxFilesPerTrigger", "1").parquet(src)),
      windowLen = "1 hour", watermark = "2 hours")
      .writeStream.format("memory").queryName("late_probe")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_late_probe").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    println("== per-batch progress ==")
    q.recentProgress.foreach { p =>
      val st = p.stateOperators.headOption
      println(s"batch=${p.batchId} rows=${p.numInputRows} " +
        s"wm=${Option(p.eventTime.get("watermark")).getOrElse("-")} " +
        s"maxET=${Option(p.eventTime.get("max")).getOrElse("-")} " +
        s"dropped=${st.map(_.numRowsDroppedByWatermark).getOrElse(-1L)} " +
        s"updated=${st.map(_.numRowsUpdated).getOrElse(-1L)}")
    }

    // model's per-batch prediction
    val ev = EventsStream.withEventTime(raw)
      .withColumn("__b", pmod(col("event_id"), lit(4)))
      .withColumn("__us", unix_micros(col("event_time")))
      .withColumn("__win_end_us",
        (call_function("div", col("__us"), lit(3600000000L)) + 1) * 3600000000L)
    val bmax = ev.groupBy("__b").agg(max("__us").as("bmax_us"), count(lit(1)).as("n"))
      .orderBy("__b").collect()
    println("== model per-batch (late-events wm lags eviction by one batch) ==")
    var runLag = 0L   // max event time over batches 0..b-2
    var runPrev = 0L  // max event time over batches 0..b-1
    bmax.foreach { r =>
      val b = r.getAs[Number](0).longValue; val m = r.getLong(1); val n = r.getLong(2)
      val wmMs = math.max(if (runLag == 0) 0L else runLag / 1000L - 7200000L, 0L)
      val dropped = ev.filter(col("__b") === b &&
        call_function("div", col("__win_end_us"), lit(1000L)) <= wmMs).count()
      println(s"batch=$b n=$n bmax_us=$m lateWm_ms=$wmMs predictedDropped=$dropped")
      runLag = runPrev
      runPrev = math.max(runPrev, m)
    }
    val streamed = spark.table("late_probe").filter(col("event_type") =!= "sentinel")
    val model = EventsStream.lateKeptRollup(EventsStream.withEventTime(raw))
    println(s"stream rows=${streamed.count()} model rows=${model.count()}")
    spark.stop()
  }
}
