package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Ivf, Pq, Similarity}

/** Production-parameterization probe for the quantizer expressions
  * (verdict r13 #1): IVF coarse assignment and PQ encoding fold their
  * model parameters into the plan. The literal Column arms grow
  * O(C·dim) / O(m·ks·d) expression nodes — this probe measures their
  * plan-build + execution cost per parameterization and the point
  * where they BREAK (analyzer/codegen limits), against the kernel arms
  * ([[graft.expressions.NearestCentroids]] /
  * [[graft.expressions.PqCodes]]) whose parameters ride as one literal
  * each (O(1) plan nodes) at production scale (C, ks = 256–4096+).
  *
  * Usage: runMain graft.tools.QuantParamProbe [sfDir] [maxC] [maxKs]
  */
object QuantParamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val maxC = args.lift(1).map(_.toInt).getOrElse(4096)
    val maxKs = args.lift(2).map(_.toInt).getOrElse(4096)
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
    val emb = graft.Tables.embeddings(spark, sfDir)
    val nVec = emb.count()
    println(s"[quantprobe] sf=$sfDir corpus=$nVec vectors")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    def run(label: String, param: Int, build: => DataFrame): Unit =
      try {
        val (df, tPlan) = time {
          val d = build
          d.queryExecution.executedPlan
          d
        }
        val (out, tExec) = time(df.agg(sum(col("probe_val"))).collect()(0))
        println(f"[quantprobe] $label%-14s p=$param%5d plan=$tPlan%8.2fs " +
          f"exec=$tExec%8.2fs checksum=${out.getLong(0)}")
      } catch {
        case e: Throwable =>
          val root = {
            var c: Throwable = e
            while (c.getCause != null && c.getCause != c) c = c.getCause
            c
          }
          println(s"[quantprobe] $label p=$param BREAK: " +
            s"${root.getClass.getSimpleName}: " +
            s"${Option(root.getMessage).getOrElse("").take(160)}")
      }

    // ---- IVF coarse assignment: nearest-cid over the whole corpus ----
    var c = 16
    while (c <= maxC) {
      val cents = Ivf.seedCentroids(emb, "vec_id", "embedding", c, stride = 1L)
      val v = Similarity.toDouble(col("embedding"))
      // kernel FIRST: the literal arm's terminal failure mode is a heap
      // OOM at plan time (measured: pq-literal ks=4096), which can take
      // the session down with it — run the healthy arm before the probe
      // that may break the JVM
      run("ivf-kernel", c,
        emb.select(element_at(
          Ivf.nearestCidsKernel(v, cents, 1), 1).cast("long").as("probe_val")))
      run("ivf-literal", c,
        emb.select(element_at(
          Ivf.nearestCidsLiteral(v, cents, 1), 1).cast("long").as("probe_val")))
      c *= 4
    }

    // ---- PQ encode: per-subspace argmin codes over the whole corpus ----
    var ks = 16
    while (ks <= maxKs) {
      val books = Pq.seedCodebooks(emb, "vec_id", "embedding", m = 8, ks = ks,
        stride = 1L)
      val v = Similarity.toDouble(col("embedding"))
      run("pq-kernel", ks,
        emb.select(element_at(
          Pq.codesColKernel(v, books), 1).cast("long").as("probe_val")))
      run("pq-literal", ks,
        emb.select(element_at(
          Pq.codesColLiteral(v, books), 1).cast("long").as("probe_val")))
      ks *= 4
    }
    spark.stop()
  }
}
