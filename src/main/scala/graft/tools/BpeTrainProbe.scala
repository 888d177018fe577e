package graft.tools

import org.apache.spark.sql.SparkSession

/** Wall-time comparison of the two BPE training arms vs round count —
  * the measurement behind [[graft.operators.Lm.DistributedTrainMaxRounds]]
  * (r14 verdict #1: "find the crossover"). The distributed arm costs one
  * sequential Spark job round-trip PER ROUND (flat in corpus size after
  * the initial count — tools/BpeProbe); the sampled arm pays one
  * distributed tokenize+sample+collect up front and then runs rounds at
  * driver-local speed. So the crossover is round-count-driven: the
  * sampled arm wins as soon as
  *   rounds × per-round-job-latency  >  sample-collect + rounds/local-rate
  * and the probe prints both sides' totals at a rounds grid, plus the
  * sampled arm alone at production-scale round counts the distributed
  * arm cannot reach in reasonable wall time.
  *
  * Usage: runMain graft.tools.BpeTrainProbe <sfDir> [maxDistRounds]
  *   [sampleDocs]
  */
object BpeTrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxDistRounds = args.lift(1).map(_.toInt).getOrElse(256)
    val sampleDocs = args.lift(2).map(_.toInt).getOrElse(
      graft.operators.Lm.DefaultTrainSampleDocs)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val grid = Seq(8, 16, 32, 64, 128, 256, 512, 1024)
      .filter(_ <= maxDistRounds)
    println(f"[bpetrain] corpus=$sfDir sampleDocs=$sampleDocs")
    println(f"[bpetrain] ${"rounds"}%8s ${"dist_s"}%10s ${"sampled_s"}%10s")
    var crossover = -1
    grid.foreach { r =>
      val (_, distS) = time(
        graft.operators.Lm.bpeMergesDistributed(
          docs, "doc_id", "text", r, "~", (_, _, _) => ()).collect())
      val (_, sampS) = time(
        graft.operators.Lm.bpeMergesSampled(
          docs, "doc_id", "text", rounds = r, sampleDocs = sampleDocs)
          .collect())
      if (crossover < 0 && sampS < distS) crossover = r
      println(f"[bpetrain] $r%8d $distS%10.2f $sampS%10.2f")
    }
    // production round counts — sampled arm only (the distributed arm
    // would take rounds × ~0.3 s ≈ hours; that asymmetry IS the result)
    Seq(4096, 16384, 50000).foreach { r =>
      val ((picks, sampS)) = time(
        graft.operators.Lm.bpeMergesSampled(
          docs, "doc_id", "text", rounds = r, sampleDocs = sampleDocs)
          .collect())
      println(f"[bpetrain] $r%8d ${"-"}%10s $sampS%10.2f " +
        f"(picked ${picks.length}%d merges, ${picks.length / sampS}%.0f rounds/s)")
    }
    if (crossover >= 0)
      println(s"[bpetrain] sampled arm first wins at rounds=$crossover " +
        s"(DistributedTrainMaxRounds=${graft.operators.Lm.DistributedTrainMaxRounds})")
    spark.stop()
  }
}
