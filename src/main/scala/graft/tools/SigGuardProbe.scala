package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Mega-cluster guard probe for the two r15 non-minhash guard designs:
  *
  *  - x4 `simhashPairs.maxSigGroup` on the ScaleGen zipf corpus: the
  *    exact-dup mega cluster produces one IDENTICAL-`sh` group whose
  *    B²/2 hamming-0 pairs survive every band knob; the guard drops the
  *    group before banding. Reported: sh-group histogram (max group,
  *    implied pair volume unguarded vs guarded) + wall/straggler for
  *    both arms.
  *  - x5 `embeddingCosinePairs` two-stage guard on a synthetic
  *    mega-cluster corpus (the zipf lane has no embeddings table): sf1
  *    embeddings + one vector duplicated `dupCopies`×. Stage 2 must
  *    drop the identical cluster (refinement cannot split identical
  *    vectors) while the rest of the corpus pairs exactly as unguarded.
  *
  * Usage: runMain graft.tools.SigGuardProbe [zipfDir] [sf1Dir] [maxBucket] [unguarded]
  */
object SigGuardProbe {
  def main(args: Array[String]): Unit = {
    val zipfDir = args.headOption.getOrElse("/root/repo/testdata/sf1zipf")
    val sf1Dir = args.lift(1).getOrElse("/root/repo/testdata/sf1")
    val maxBucket = args.lift(2).map(_.toInt).getOrElse(64)
    val runUnguarded = args.lift(3).contains("unguarded")
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
      println(f"[sigguard] $label%-40s wall=$wall%8.2f s worst max/med=$skew")
      r
    }

    // ---- x4: simhash on the zipf near-dup corpus ----
    val corpus = graft.queries.TextQueries.nearDupCorpus(spark, zipfDir)
      .localCheckpoint()
    println(s"[sigguard] x4 corpus=$zipfDir rows=${corpus.count()} " +
      s"maxSigGroup=$maxBucket")
    val shHist = Dedup.simhashes(corpus, "doc_id", "text")
      .groupBy("sh").agg(count(lit(1)).as("g")).localCheckpoint()
    val shStats = shHist.agg(
      max(col("g")).as("max_g"),
      sum(col("g") * (col("g") - 1) / 2).as("pairs_all"),
      sum(when(col("g") <= maxBucket, col("g") * (col("g") - 1) / 2)
        .otherwise(0L)).as("pairs_guarded"),
      sum(when(col("g") > maxBucket, 1L).otherwise(0L)).as("dropped_groups"))
      .collect()(0)
    println(s"[sigguard] x4 max sh-group=${shStats.getLong(0)} " +
      s"identical-sig pairs unguarded=${shStats.getAs[Any](1)} " +
      s"guarded=${shStats.getAs[Any](2)} dropped groups=${shStats.getLong(3)}")
    phase(s"x4 simhash guarded (maxSigGroup=$maxBucket)") {
      val n = Dedup.simhashPairs(corpus, "doc_id", "text",
        maxHamming = 6, bands = 7, maxSigGroup = maxBucket).count()
      println(s"[sigguard]   pairs=$n")
    }
    if (runUnguarded) phase("x4 simhash UNGUARDED") {
      val n = Dedup.simhashPairs(corpus, "doc_id", "text",
        maxHamming = 6, bands = 7).count()
      println(s"[sigguard]   pairs=$n")
    }

    // ---- x5: embedding pairs with a synthetic identical mega cluster ----
    val emb = graft.Tables.embeddings(spark, sf1Dir)
      .select(col("vec_id"), col("embedding"))
    val hot = emb.orderBy("vec_id").limit(1)
      .crossJoin(spark.range(5000).select(col("id")))
      .select((col("id") + 10000000L).as("vec_id"), col("embedding"))
    val vcorpus = emb.unionByName(hot).localCheckpoint()
    val n = vcorpus.count()
    val planes = Similarity.planesFor(n, targetBucket = 32)
    println(s"[sigguard] x5 corpus=$sf1Dir+5000 dups rows=$n planes=$planes")
    phase(s"x5 embedding guarded (maxBucket=$maxBucket)") {
      val c = Dedup.embeddingCosinePairs(vcorpus, "vec_id", "embedding",
        threshold = 0.95, planes = planes,
        maxBucketSize = maxBucket, refinePlanes = planes).count()
      println(s"[sigguard]   pairs=$c")
    }
    if (runUnguarded) phase("x5 embedding UNGUARDED") {
      val c = Dedup.embeddingCosinePairs(vcorpus, "vec_id", "embedding",
        threshold = 0.95, planes = planes).count()
      println(s"[sigguard]   pairs=$c")
    }

    // ---- sd1: semantic dedup with the exact-duplicate pre-collapse ----
    // The Σ|cluster|² contract breaks on identical vectors (one cluster
    // holds all B copies regardless of C); the collapse routes them to
    // a min-id rep before the within-cluster pair join.
    val cSd = graft.operators.Ivf.centroidsFor(n)
    println(s"[sigguard] sd1 corpus=rows=$n c=$cSd")
    phase("sd1 semantic dedup COLLAPSED (default)") {
      val kept = Dedup.semanticDedup(vcorpus, "vec_id", "embedding",
        threshold = 0.9, c = cSd).filter(col("kept")).count()
      println(s"[sigguard]   kept=$kept")
    }
    if (runUnguarded) phase("sd1 semantic dedup NO COLLAPSE") {
      val kept = Dedup.semanticDedup(vcorpus, "vec_id", "embedding",
        threshold = 0.9, c = cSd, collapseIdentical = false)
        .filter(col("kept")).count()
      println(s"[sigguard]   kept=$kept")
    }
    spark.stop()
  }
}
