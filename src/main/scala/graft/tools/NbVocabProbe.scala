package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Classifier

/** NB classifier vocabulary-scale probe: the Classifier scaladoc claims
  * the scoring join "AQE-broadcasts the model side when it fits and
  * falls back to a term-keyed shuffle join when it doesn't", and that
  * hot tokens (stopwords riding millions of tf rows) don't strand a
  * task. This probe MEASURES both claims instead of arguing them, on a
  * synthetic power-law corpus whose vocabulary size is the swept knob
  * (the gate corpora top out at ~60 distinct tokens — two to four
  * orders short of a production fastText vocabulary).
  *
  * Corpus: D docs × L tokens, token of rank r drawn by inverse power
  * law (u^a stretched over V ranks, a = 4 → the top 1 % of ranks carry
  * ~32 % of all token mass — stopword-grade skew on the join key).
  * Everything is generated distributed from spark.range — no driver
  * arrays, no testdata dependency.
  *
  * Reports per V: realized |V|, train/score wall, the JOIN STRATEGY the
  * final adaptive plan picked for the tf ⋈ model join, and the worst
  * per-stage task max/median (straggler signature, SkewProbe contract).
  *
  * Usage: runMain graft.tools.NbVocabProbe [D] [L] [V1,V2,...] [a]
  * (a = power-law exponent; 1 = uniform draw, maximizing realized |V|
  * — the "how big can the model side get" arm.)
  */
object NbVocabProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val docLen = args.lift(1).map(_.toInt).getOrElse(100)
    val vocabs = args.lift(2).map(_.split(",").toSeq.map(_.toLong))
      .getOrElse(Seq(10000L, 100000L, 1000000L))
    val exponent = args.lift(3).map(_.toDouble).getOrElse(4.0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val taskMs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null) taskMs.add((te.stageId, te.taskInfo.duration))
    })
    def skewLine(): String = {
      Thread.sleep(300)
      val byStage = taskMs.toArray(new Array[(Int, Long)](0)).toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      val eligible = byStage.filter(_._2.length >= 4)
      if (eligible.isEmpty) "no stage with >=4 tasks"
      else {
        val ds = eligible.maxBy { case (_, d) =>
          d.last.toDouble / d(d.length / 2).max(1L) }._2
        val med = ds(ds.length / 2).max(1L)
        f"worst-stage max/med=${ds.last.toDouble / med}%5.2f " +
          f"(med=${med}ms max=${ds.last}ms n=${ds.length})"
      }
    }

    val classes = Seq("c0", "c1", "c2", "c3", "c4")
    for (v <- vocabs) {
      // token rank: u in [0,1) from (doc, pos) hash; rank = floor(u^4 * V)
      // (power-law mass toward low ranks); the label token "langK" is
      // appended so classes are separable and every class has evidence.
      val docs = spark.range(nDocs).toDF("doc_id")
        .withColumn("label", concat(lit("c"), (col("doc_id") % 5).cast("string")))
        .withColumn("text", concat_ws(" ",
          transform(sequence(lit(0), lit(docLen - 1)), j => {
            val u = pmod(xxhash64(col("doc_id"), j, lit(v)), lit(1000000000L))
              .cast("double") / 1.0e9
            concat(lit("t"), floor(pow(u, exponent) * v).cast("long").cast("string"))
          })))
        .withColumn("text", concat(col("text"), lit(" mark_"), col("label")))
        .localCheckpoint() // corpus fixed before timing; not part of the cost

      val seed = docs.filter(col("doc_id") % 2 === 0)

      taskMs.clear()
      var t0 = System.nanoTime()
      val stats = Classifier.nbTermStats(seed, "text", "label", classes)
        .localCheckpoint(false)
      val realizedV = stats.count()
      val trainWall = (System.nanoTime() - t0) / 1e9
      val trainSkew = skewLine()

      taskMs.clear()
      t0 = System.nanoTime()
      val scored = Classifier.nbScoreFromStats(docs, stats,
        Classifier.nbPriors(seed, "label", classes), "doc_id", "text", classes)
      val n = scored.count()
      val scoreWall = (System.nanoTime() - t0) / 1e9
      val scoreSkew = skewLine()

      val plan = scored.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val strategy =
        if (plan.contains("BroadcastHashJoin")) "BroadcastHashJoin"
        else if (plan.contains("SortMergeJoin")) "SortMergeJoin"
        else if (plan.contains("ShuffledHashJoin")) "ShuffledHashJoin"
        else "?"
      if (sys.env.get("NBVOCAB_PLAN").contains("full"))
        println(plan)
      else if (sys.env.contains("NBVOCAB_PLAN"))
        plan.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange"))
          .foreach(l => println(s"[nbvocab-plan] ${l.trim.take(160)}"))
      println(f"[nbvocab] V=$v%8d realized|V|=$realizedV%8d docs=$n%8d " +
        f"train=$trainWall%7.2f s ($trainSkew) " +
        f"score=$scoreWall%7.2f s ($scoreSkew) join=$strategy")
    }
    spark.stop()
  }
}
