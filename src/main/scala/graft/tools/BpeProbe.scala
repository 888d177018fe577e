package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-round cost audit for delta-maintained BPE merge training
  * (CcProbe precedent: a committed, reproducible breakdown). Runs
  * [[graft.operators.Lm.bpeMerges]] over the documents table with the
  * probe hook wired, printing each round's phase costs:
  *
  *   - tokenize / initial_count (round 0): the one-time corpus
  *     tokenization and the ONE full pair explode+count — the cost a
  *     full-recount trainer pays EVERY round;
  *   - per round: top1 (counts-frame pull), delta_counts (±pairs from
  *     `contains`-filtered rows + counts merge), rewrite (conditional
  *     corpus re-checkpoint).
  *
  * The scaling claim under test: steady-state round cost (top1 +
  * delta_counts + rewrite) stays well below initial_count, because no
  * full pair explode/shuffle ever re-runs — the property that makes
  * 10k-round production training feasible where the round-12
  * full-recount shape was O(rounds × corpus-pairs).
  *
  * Usage: runMain graft.tools.BpeProbe <sfDir> [rounds]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(10)
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
    // (round, phase) -> seconds, printed in arrival order
    val rows = scala.collection.mutable.ArrayBuffer[(Int, String, Double)]()
    val got = graft.operators.Lm.bpeMergesDistributed(docs, "doc_id", "text",
      rounds = rounds, joiner = "~",
      onRound = (r, phase, nanos) => rows += ((r, phase, nanos / 1e9)))
    val picks = got.collect()
    rows.foreach { case (r, phase, s) =>
      println(f"[bpeprobe] round $r%3d  $phase%-14s $s%8.3f s")
    }
    val init = rows.collect { case (0, "initial_count", s) => s }.sum
    val perRound = rows.filter(_._1 > 0).groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
    val steady = perRound.drop(1).map(_._2) // round 1 shares no state yet either
    println(f"[bpeprobe] initial full count: $init%.3f s; steady-state " +
      f"round mean: ${if (steady.nonEmpty) steady.sum / steady.size else 0.0}%.3f s " +
      f"over ${steady.size} rounds; picks: ${picks.length}")
    spark.stop()
  }
}
