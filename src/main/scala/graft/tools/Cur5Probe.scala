package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-stage budget for the cur5 composed curation chain at big SF
  * (r14 verdict #5): individual operators carry sf10 pins, but
  * COMPOSITION is where checkpoint/reuse boundaries usually break — a
  * stage that silently re-runs its upstream, or a hot key that only
  * shows up after the resample reshapes the key distribution, is
  * invisible in per-operator probes. This probe runs the exact gate
  * chain stage by stage, materializing each stage boundary (eager
  * localCheckpoint) so each reading is that stage's own cost, and
  * reports wall time, row count, and the worst within-stage
  * task max/median (the SkewProbe straggler signature; quiet-box noise
  * band < ~3).
  *
  * r16 verdict #3 extension: the probe now runs the chain
  * SPARK_GRAFT_PROBE_ROUNDS times (default 2) in ONE JVM and prints a
  * first-vs-warm per-stage table — the sf10 bench showed a 1.48×
  * first-run outlier the 3-run-median convention hides, and this
  * attributes the cold cost to specific stages (JIT + codegen compile +
  * page-cache fill vs a checkpoint boundary silently re-running).
  *
  * Usage: runMain graft.tools.Cur5Probe <sfDir>
  */
object Cur5Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROUNDS", "2").toInt
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
    val walls = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    def stage(label: String)(f: => DataFrame): DataFrame = {
      taskMs.clear()
      val t0 = System.nanoTime()
      val cp = f.localCheckpoint() // eager: materializes this stage NOW
      val n = cp.count()
      val wall = (System.nanoTime() - t0) / 1e9
      walls(label) = walls.getOrElse(label, Vector.empty) :+ wall
      Thread.sleep(300)
      val byStage = taskMs.toArray(new Array[(Int, Long)](0)).toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      val eligible = byStage.filter(_._2.length >= 4)
      // two readings: the worst ratio stage (catches trivial-median
      // artifact stages — a 30-row bench build where most tasks are
      // empty) and the worst ratio among SUBSTANTIAL stages
      // (med >= 50 ms), which is the actual straggler signal
      def fmt(ds: Seq[Long]): String = {
        val med = ds(ds.length / 2).max(1L)
        f"${ds.last.toDouble / med}%6.2f (med=${med}ms max=${ds.last}ms n=${ds.length})"
      }
      val worstAll = if (eligible.nonEmpty)
        fmt(eligible.maxBy { case (_, d) =>
          d.last.toDouble / d(d.length / 2).max(1L) }._2)
        else "n/a"
      val big = eligible.filter { case (_, d) => d(d.length / 2) >= 50 }
      val worstBig = if (big.nonEmpty)
        fmt(big.maxBy { case (_, d) =>
          d.last.toDouble / d(d.length / 2).max(1L) }._2)
        else "n/a"
      println(f"[cur5probe] $label%-22s wall=$wall%8.2f s rows=$n%9d " +
        f"worst=$worstAll substantial=$worstBig")
      cp
    }

    import graft.functions.TextAnalysis
    import graft.operators.{Classifier, Dedup, Packing, Sampling}
    val langs = Seq("de", "en", "es", "fr", "zh")

    (1 to rounds).foreach { round =>
    println(s"[cur5probe] ===== round $round of $rounds =====")
    val t0 = System.nanoTime()

    val cleaned = stage("1_clean")(
      graft.Tables.documents(spark, sfDir).select(col("doc_id"),
        TextAnalysis.cleanText(col("text")).as("text"), col("lang")))
    val kept = stage("2_nb_resample")(
      Classifier.importanceResample(
        Classifier.nbScore(cleaned, cleaned.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", "lang", langs),
        "en", langs, graft.queries.ClassifierQueries.ResampleSeed,
        tau = 0.02, temperature = 0.02).select("doc_id"))
    val corpus = stage("3_reattach_text")(
      kept.join(cleaned.select(col("doc_id"), col("text")), "doc_id"))
    val pairs = stage("4_minhash_pairs")(
      Dedup.minhashLshPairsShared(corpus, "doc_id", "text",
        n = 3, bands = 16, rowsPerBand = 8, threshold = 0.6))
    val clusters = stage("5_components")(
      Dedup.clusters(pairs, "id_a", "id_b")
        .select(col("id").as("doc_id"), col("cluster_id")))
    val survivors = stage("6_keep_best")(
      corpus.join(clusters, Seq("doc_id"), "left_anti")
        .unionByName(
          Dedup.clusterRepresentatives(clusters, "doc_id", "cluster_id",
            corpus.select(col("doc_id"),
              TextAnalysis.qualityScore(col("text")).as("q")), "doc_id", "q")
          .select(col("keep_id").as("doc_id")).join(corpus, "doc_id"))
        .repartition(col("doc_id"))) // the gate's stage-boundary rebalance
    val fin = stage("7_decontaminate")(
      Dedup.contamination(survivors, "doc_id", "text",
          cleaned.filter(col("doc_id") < 30).select(col("text")), "text", n = 8)
        .filter(col("n_hit") === 0).select("doc_id")
        .join(survivors, "doc_id")
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens")))
    val packed = stage("8_split_pack")(
      Packing.packSequences(
        Sampling.hashSplit(fin, "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 5005L),
        "n_tokens", "doc_id", budget = 2048L))
    val total = (System.nanoTime() - t0) / 1e9
    val counts = packed.groupBy(col("split")).count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
    println(f"[cur5probe] TOTAL $total%.2f s  splits: $counts")
    walls("TOTAL") = walls.getOrElse("TOTAL", Vector.empty) :+ total
    // drop this round's checkpoint blocks so the next round re-runs the
    // full lineage (warm JIT/codegen/page-cache, no block reuse)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }

    if (rounds > 1) {
      println("[cur5probe] ===== first-vs-warm per stage =====")
      walls.foreach { case (label, ws) =>
        val warmMin = ws.tail.min
        println(f"[cur5probe] $label%-22s cold=${ws.head}%8.2f s warm=" +
          ws.tail.map(w => f"$w%.2f").mkString("/") +
          f" s cold/warm=${ws.head / warmMin}%5.2f")
      }
    }
    spark.stop()
  }
}
