package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Zipf-corpus skew probe for the CROSS-dedup guard (the r15 extension
  * of the x3-family band-bucket guard to `crossDedupRoster` /
  * `incrementalDedupRoster`): on a corpus with an exact-dup mega
  * cluster, a (band, bucket) key holds the whole cluster on BOTH sides
  * of the A×B join — split A's b copies and split B's b perturbed
  * copies — so the unguarded cross join emits a·b ≈ b² candidates per
  * band, the same quadratic term the self-join family had, but paid
  * through a two-sided join the self-join guard never saw.
  *
  * Reports:
  *  1. combined-membership histogram of the cross banding (A ∪ B per
  *     (band, bucket)): max combined size and the implied A×B candidate
  *     volume Σ a·b — unguarded vs guarded, from the histogram only
  *     (no pairs materialized);
  *  2. guarded crossDedupRoster end-to-end: wall, roster rows,
  *     worst-stage task max/median (the SkewProbe straggler contract);
  *  3. optional unguarded end-to-end (arg 3 = "unguarded") — expect the
  *     x10/x13 unguarded class (minutes) on zipf corpora.
  *
  * Usage: runMain graft.tools.CrossSkewProbe [zipfDir] [maxBucket] [unguarded]
  */
object CrossSkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1zipf")
    val maxBucket = args.lift(1).map(_.toInt).getOrElse(64)
    val runUnguarded = args.lift(2).contains("unguarded")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val taskMs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null) taskMs.add((te.stageId, te.taskInfo.duration))
    })
    def phase[A](label: String)(f: => A): A = {
      taskMs.clear()
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val byStage = taskMs.toArray(new Array[(Int, Long)](0)).toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      val eligible = byStage.filter(_._2.length >= 4)
      val skew = if (eligible.isEmpty) "n/a" else {
        val ds = eligible.maxBy { case (_, d) =>
          d.last.toDouble / d(d.length / 2).max(1L) }._2
        f"${ds.last.toDouble / ds(ds.length / 2).max(1L)}%4.2f " +
          f"(med=${ds(ds.length / 2)}ms max=${ds.last}ms)"
      }
      println(f"[xskew] $label%-38s wall=$wall%8.2f s worst max/med=$skew")
      r
    }

    val left = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val right = graft.queries.TextQueries.perturbedDocs(spark, sfDir)
    println(s"[xskew] corpus=$sfDir A=${left.count()} B=${right.count()} " +
      s"maxBucket=$maxBucket")

    // 1. combined-membership histogram: band both sides exactly as the
    //    operator does (signatureStore carries the same hash family),
    //    count per (band, bucket, side), derive a·b and the combined size
    def bandedOf(df: DataFrame0): DataFrame0 = {
      val sigs = Dedup.signatureStore(df, "doc_id", "text")
        .select(col("id"), col("sig"))
      sigs.select(col("id"),
        posexplode(array((0 until 16).map(b =>
          slice(col("sig"), b * 8 + 1, 8)): _*)))
        .withColumn("bucket", xxhash64(col("pos"), col("col").cast("string")))
        .select(col("pos").as("band"), col("bucket"))
    }
    val hist = bandedOf(left).groupBy("band", "bucket")
      .agg(count(lit(1)).as("a"))
      .join(bandedOf(right).groupBy("band", "bucket")
        .agg(count(lit(1)).as("b")), Seq("band", "bucket"), "full_outer")
      .na.fill(0L, Seq("a", "b"))
      .withColumn("combined", col("a") + col("b"))
      .localCheckpoint()
    val stats = hist.agg(
      max(col("combined")).as("max_combined"),
      sum(col("a") * col("b")).as("cand_all"),
      sum(when(col("combined") <= maxBucket, col("a") * col("b"))
        .otherwise(0L)).as("cand_guarded"),
      sum(when(col("combined") > maxBucket, 1L).otherwise(0L)).as("dropped"))
      .collect()(0)
    println(s"[xskew] max combined bucket=${stats.getLong(0)} " +
      s"implied A*B candidates unguarded=${stats.getAs[Any](1)} " +
      s"guarded=${stats.getAs[Any](2)} dropped buckets=${stats.getLong(3)}")

    // 2. guarded end-to-end (the x11 gate shape)
    phase(s"x11 cross guarded (maxBucket=$maxBucket)") {
      val n = Dedup.crossDedupRoster(left, right, "doc_id", "text",
        n = 3, bands = 16, rowsPerBand = 8, threshold = 0.6,
        maxBucketSize = maxBucket).count()
      println(s"[xskew]   roster rows=$n")
    }

    // 3. optional unguarded arm — the number the guard exists to delete
    if (runUnguarded) phase("x11 cross UNGUARDED") {
      val n = Dedup.crossDedupRoster(left, right, "doc_id", "text",
        n = 3, bands = 16, rowsPerBand = 8, threshold = 0.6).count()
      println(s"[xskew]   roster rows=$n")
    }
    spark.stop()
  }

  private type DataFrame0 = org.apache.spark.sql.DataFrame
}
