package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing audit for the x8 large-star/small-star components
  * tail (CcProbe precedent for the x6 min-label path): times, separately,
  *
  *   1. the minhash-LSH pair pipeline (the shared x3/x6/x8 cost);
  *   2. raw-pair checkpoint + canonical (big -> small) edge derivation;
  *   3. each alternation round, split into large-star, small-star +
  *      checkpoint, and the verified-convergence check — so per-round
  *      growth (the O(log n) claim) and the check's overhead are both
  *      visible individually at any scale factor;
  *   4. the final star-forest -> (id, cluster_id) projection.
  *
  * The loop body mirrors Dedup.componentsAlternating exactly; the only
  * difference is a count() per phase to force materialization at the
  * phase boundary being timed.
  *
  * Usage: runMain graft.tools.StarProbe <sfDir>
  */
object StarProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[starprobe] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val pairs = graft.operators.Dedup.minhashLshPairsShared(
      graft.queries.TextQueries.nearDupCorpus(spark, sfDir), "doc_id", "text",
      n = 3, bands = 16, rowsPerBand = 8, threshold = 0.6)
    val raw = t("pairs pipeline + checkpoint") {
      val r = pairs.select(col("id_a").as("a"), col("id_b").as("b")).localCheckpoint()
      r.count(); r
    }
    var edges = t("canonical edges") {
      val e = raw
        .select(greatest(col("a"), col("b")).as("src"),
          least(col("a"), col("b")).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
        .localCheckpoint()
      println(s"[starprobe]   edge rows: ${e.count()}")
      e
    }
    var converged = false
    var round = 0
    while (!converged && round < 40) {
      round += 1
      val sym = edges.select(explode(array(
          struct(col("src").as("u"), col("dst").as("v")),
          struct(col("dst").as("u"), col("src").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
      val ls = t(s"round $round large-star") {
        val lsMins = sym.groupBy(col("u"))
          .agg(least(min(col("v")), col("u")).as("m"))
        val l = sym.join(lsMins, "u")
          .filter(col("v") > col("u"))
          .select(col("v").as("src"), col("m").as("dst"))
          .distinct()
          .localCheckpoint(false)
        l.count(); l
      }
      val next = t(s"round $round small-star") {
        val ssMins = ls.groupBy(col("src").as("u")).agg(min(col("dst")).as("m"))
        val hooked = ls.join(ssMins, col("src") === col("u"))
          .filter(col("dst") =!= col("m"))
          .select(col("dst").as("src"), col("m").as("dst"))
        val n = hooked
          .unionByName(ssMins.select(col("u").as("src"), col("m").as("dst")))
          .distinct()
          .localCheckpoint(false)
        n.count(); n
      }
      converged = t(s"round $round convergence check") {
        next.count() == edges.count() && next.exceptAll(edges).isEmpty
      }
      edges = next
    }
    println(s"[starprobe] converged after $round rounds")
    t("final projection + count") {
      val nodes = raw.select(explode(array(col("a"), col("b"))).as("id")).distinct()
      val out = nodes.join(edges, nodes("id") === edges("src"), "left")
        .select(nodes("id"), coalesce(col("dst"), nodes("id")).as("cluster_id"))
      println(s"[starprobe]   labeled nodes: ${out.count()}")
    }
    spark.stop()
  }
}
