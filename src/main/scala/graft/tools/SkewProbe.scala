package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Hot-key straggler probe (verdict r13 #3): the x9/x10/x6 scaladocs
  * argue their aggregates are SKEW-SAFE because they are map-side
  * combinable (a 10⁸-copy paragraph combines per map partition; a
  * mega-cluster argmax never lands one reducer) — this probe MEASURES
  * that claim instead of arguing it, on a ScaleGen `zipf` corpus where
  * one paragraph rides ~10 % of all docs and one exact-dup cluster
  * holds ~10 % of all nodes.
  *
  * Per phase it reports wall time AND the task-duration distribution
  * (n, median, max, max/median) of every task that ran in the phase —
  * a hot key landing in one task would show up as max/median far above
  * the scheduling noise band (empirically < ~3 on a quiet box), which
  * is the straggler signature this probe exists to rule out.
  *
  * Usage: first `ScaleGen <in> <outZipf> 10 documents zipf`, then
  *        `runMain graft.tools.SkewProbe <zipfDir>`
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1zipf")
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

    // Skew is a WITHIN-stage question: a hot key strands one task of the
    // stage that processes the hot partition; comparing tasks across
    // stages (a 2 s scan task vs an 80 ms reduce task) would read plan
    // heterogeneity as a straggler. Report each phase's wall time plus
    // the worst per-stage max/median over stages with enough tasks for a
    // median to mean anything.
    def phase[A](label: String)(f: => A): A = {
      taskMs.clear()
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are posted async; drain the queue after a settle
      Thread.sleep(300)
      val byStage = taskMs.toArray(new Array[(Int, Long)](0)).toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      val eligible = byStage.filter(_._2.length >= 4)
      if (eligible.nonEmpty) {
        val worst = eligible.maxBy { case (_, ds) =>
          ds.last.toDouble / ds(ds.length / 2).max(1L)
        }
        val ds = worst._2
        val med = ds(ds.length / 2).max(1L)
        println(f"[skewprobe] $label%-28s wall=$wall%8.3f s " +
          f"stages=${byStage.size} tasks=${byStage.values.map(_.size).sum}%5d " +
          f"worst-stage max/med=${ds.last.toDouble / med}%5.2f " +
          f"(med=${med}ms max=${ds.last}ms n=${ds.length})")
      } else println(f"[skewprobe] $label%-28s wall=$wall%8.3f s " +
        f"tasks=${byStage.values.map(_.size).sum} (no stage with >=4 tasks)")
      r
    }

    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    val hotPara = docs.filter(col("text").contains(ScaleGen.HotParagraph)).count()
    val hotDup = docs.filter(col("text") === ScaleGen.HotDocText).count()
    println(s"[skewprobe] sf=$sfDir docs=$nDocs " +
      s"hot-paragraph copies=$hotPara (${100.0 * hotPara / nDocs}%) " +
      s"mega-cluster members=$hotDup (${100.0 * hotDup / nDocs}%)")
    require(hotPara > 0 && hotDup > 0,
      "SkewProbe: corpus has no hot keys — generate it with ScaleGen's zipf mode")

    // ---- x9: paragraph dedup with one paragraph on 10 % of docs ----
    phase("x9 dedupParagraphs") {
      val out = Dedup.dedupParagraphs(docs, "doc_id", "text")
        .agg(count(lit(1)), sum(length(col("text")))).collect()(0)
      println(s"[skewprobe]   survivors=${out.getLong(0)} chars=${out.getLong(1)}")
    }

    // ---- exact-dup clusters (the 10 % mega-cluster) ----
    val clusters = phase("exact-dup clustering") {
      val hubs = docs.select(col("doc_id"), xxhash64(col("text")).as("h"))
        .groupBy(col("h")).agg(min(col("doc_id")).as("cluster_id"))
      val c = docs.select(col("doc_id"), xxhash64(col("text")).as("h"))
        .join(hubs, "h").select(col("doc_id"), col("cluster_id"))
        .localCheckpoint()
      val top = c.groupBy(col("cluster_id")).count()
        .orderBy(desc("count")).limit(1).collect()(0)
      println(s"[skewprobe]   largest cluster=${top.getLong(1)} members " +
        s"(hub ${top.getLong(0)})")
      c
    }

    // ---- x10: keep-best over the mega-cluster ----
    phase("x10 clusterRepresentatives") {
      val scored = docs.select(col("doc_id"),
        (length(col("text")).cast("double") / lit(1000.0)).as("q"))
      val out = Dedup.clusterRepresentatives(clusters, "doc_id", "cluster_id",
          scored, "doc_id", "q")
        .agg(count(lit(1)), max(col("n_members"))).collect()(0)
      println(s"[skewprobe]   clusters=${out.getLong(0)} " +
        s"largest=${out.getLong(1)}")
    }

    // ---- x6: components over the mega-star pair list ----
    phase("x6 components (mega-star)") {
      val edges = clusters.filter(col("doc_id") =!= col("cluster_id"))
        .select(col("cluster_id").as("id_a"), col("doc_id").as("id_b"))
      val out = Dedup.components(edges, "id_a", "id_b")
        .agg(count(lit(1)), count_distinct(col("cluster_id"))).collect()(0)
      println(s"[skewprobe]   labeled=${out.getLong(0)} " +
        s"components=${out.getLong(1)}")
    }
    spark.stop()
  }
}
