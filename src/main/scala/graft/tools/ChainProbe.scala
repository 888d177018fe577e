package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Chain-regime stress for the components family (verdict r13 #6): the
  * star path ([[graft.operators.Dedup.componentsAlternating]]) exists
  * for HIGH-DIAMETER graphs, but every committed measurement so far was
  * clique-ish (2 rounds). This probe builds chain graphs — n nodes in
  * chains of length L, so diameter = L−1 — at a fixed edge budget and
  * times min-label (per-hop rounds) vs star (O(log) rounds) across L,
  * pinning the crossover the `clusters` facade's min-label iteration
  * budget is set from.
  *
  * Ids are bit-mixed (splitmix-style) so the component minimum sits at
  * a RANDOM position in each chain, not at an end — min-label then
  * needs ~L·(something ≤ 1) rounds on average rather than the
  * adversarial exact L−1, which is the honest regime.
  *
  * Usage: runMain graft.tools.ChainProbe [nEdges] [maxChainLen]
  */
object ChainProbe {
  def main(args: Array[String]): Unit = {
    val nEdges = args.headOption.map(_.toLong).getOrElse(1000000L)
    val maxLen = args.lift(1).map(_.toInt).getOrElse(256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic id scrambling: x -> (a·x) mod 2^31 with odd `a` is a
    // bijection on [0, 2^31) (so chain ids stay distinct) and the product
    // stays < 2^63 for any id < 2^31 — ANSI-overflow-safe, unlike a
    // splitmix-style 64-bit mix
    def mixed(c: org.apache.spark.sql.Column) =
      pmod(c * lit(2654435761L), lit(2147483648L))

    for (len <- Iterator.iterate(2)(_ * 4).takeWhile(_ <= maxLen)) {
      // n nodes in chains of length `len`: edge (i, i+1) unless i ends a chain
      val nNodes = nEdges // ~1 edge per node at any len
      val edges = spark.range(nNodes)
        .filter(col("id") % len =!= (len - 1))
        .select(mixed(col("id")).as("id_a"), mixed(col("id") + 1).as("id_b"))
        .localCheckpoint()
      val ne = edges.count()
      def t[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val (nMin, tMin) = t {
        try {
          val c = Dedup.components(edges, "id_a", "id_b", maxIters = maxLen + 4)
            .agg(count_distinct(col("cluster_id"))).collect()(0).getLong(0)
          c.toString
        } catch { case e: IllegalStateException => "DNF(" + e.getMessage.take(40) + ")" }
      }
      val (nStar, tStar) = t {
        Dedup.componentsAlternating(edges, "id_a", "id_b")
          .agg(count_distinct(col("cluster_id"))).collect()(0).getLong(0)
      }
      println(f"[chainprobe] len=$len%4d edges=$ne%9d " +
        f"min-label=$tMin%8.2fs (components=$nMin) " +
        f"star=$tStar%8.2fs (components=$nStar)")
    }
    spark.stop()
  }
}
