package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Classifier, Dedup}

/** Zipf-corpus skew probe for the round-14 additions: the x13
  * edit-distance scaladoc claims a mega-dup cluster lands its whole
  * membership in one band bucket (B²/2 candidate blow-up) and that
  * `maxBucketSize` removes exactly that term; the NB classifier claims
  * skew-IMMUNITY by shape (hot tokens ride a broadcast join + map-side
  * combine — no token-keyed shuffle exists). Both measured here on the
  * ScaleGen zipf corpus (10 % exact-dup mega cluster, 10 % hot
  * paragraph).
  *
  * Reports:
  *  1. band-bucket histogram of the x13 banding: max bucket size and
  *     the IMPLIED candidate volume Σ b(b−1)/2 — unguarded vs guarded
  *     (computed from the histogram, no pairs materialized);
  *  2. guarded editDistancePairs end-to-end: wall, rows, worst-stage
  *     task max/median (straggler signature, SkewProbe contract);
  *  3. NB train+score over the zipf corpus: wall + task stats.
  *
  * Usage: runMain graft.tools.EditDistSkewProbe [zipfDir] [maxBucket]
  */
object EditDistSkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1zipf")
    val maxBucket = args.lift(1).map(_.toInt).getOrElse(64)
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
      println(f"[edskew] $label%-34s wall=$wall%8.2f s worst max/med=$skew")
      r
    }

    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    println(s"[edskew] corpus=$sfDir docs=${docs.count()} maxBucket=$maxBucket")

    // 1. bucket histogram + implied candidate volume (no pairs built):
    //    reuse the EXACT banding derivation via the signature store
    val sigs = Dedup.signatureStore(docs, "doc_id", "text")
      .select(col("id"), col("sig")).localCheckpoint()
    val banded = sigs.select(col("id"),
      posexplode(array((0 until 16).map(b =>
        slice(col("sig"), b * 8 + 1, 8)): _*)))
      .withColumn("bucket", xxhash64(col("pos"), col("col").cast("string")))
      .select(col("pos").as("band"), col("bucket"))
    val hist = banded.groupBy("band", "bucket").agg(count(lit(1)).as("b"))
      .localCheckpoint()
    val stats = hist.agg(
      max(col("b")).as("max_b"),
      sum(col("b") * (col("b") - 1) / 2).as("cand_all"),
      sum(when(col("b") <= maxBucket, col("b") * (col("b") - 1) / 2)
        .otherwise(0L)).as("cand_guarded"),
      sum(when(col("b") > maxBucket, 1L).otherwise(0L)).as("n_dropped_buckets"))
      .collect()(0)
    println(s"[edskew] max bucket=${stats.getLong(0)} " +
      s"implied candidates unguarded=${stats.getAs[Any](1)} " +
      s"guarded=${stats.getAs[Any](2)} dropped buckets=${stats.getLong(3)}")

    // 2. guarded end-to-end
    phase(s"x13 guarded (maxBucket=$maxBucket)") {
      val n = Dedup.editDistancePairs(docs, "doc_id", "text",
        maxDist = 24, maxBucketSize = maxBucket).count()
      println(s"[edskew]   pairs=$n")
    }

    // 3. NB classifier on the zipf corpus (hot tokens, by-shape immunity)
    phase("nb train+score (zipf tokens)") {
      val langs = Seq("c0", "c1", "c2", "c3")
      val labeled = docs.withColumn("label",
        concat(lit("c"), (col("doc_id") % 4).cast("string")))
      // seed = every third doc so all four doc_id%4 classes appear
      val n = Classifier.nbScore(labeled,
        labeled.filter(col("doc_id") % 3 === 0),
        "doc_id", "text", "label", langs).count()
      println(s"[edskew]   scored=$n")
    }
    spark.stop()
  }
}
