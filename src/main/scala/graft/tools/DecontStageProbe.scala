package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: name the straggler stage inside cur5's decontamination
  * phase (Cur5Probe saw med=51ms/max=8.3s there at sf10). Prints every
  * stage's name, task count, median and max task time for JUST the
  * contamination computation over the post-dedup survivor set shape. */
object DecontStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tasks = new java.util.concurrent.ConcurrentHashMap[Int, java.util.Vector[Long]]()
    val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null)
          tasks.computeIfAbsent(te.stageId, _ => new java.util.Vector[Long]())
            .add(te.taskInfo.duration)
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        names.put(sc.stageInfo.stageId, sc.stageInfo.name)
    })
    import graft.functions.TextAnalysis
    val cleaned = graft.Tables.documents(spark, sfDir).select(col("doc_id"),
      TextAnalysis.cleanText(col("text")).as("text")).localCheckpoint()
    cleaned.count()
    tasks.clear(); names.clear()
    val t0 = System.nanoTime()
    val out = graft.operators.Dedup.contamination(cleaned, "doc_id", "text",
      cleaned.filter(col("doc_id") < 30).select(col("text")), "text", n = 8)
      .filter(col("n_hit") === 0).count()
    println(f"[decont] wall=${(System.nanoTime() - t0) / 1e9}%.2f s rows=$out")
    Thread.sleep(500)
    tasks.forEach { (sid, v) =>
      val ds = v.toArray(new Array[java.lang.Long](0)).map(_.toLong).sorted
      val med = ds(ds.length / 2).max(1L)
      println(f"[decont] stage $sid%4d n=${ds.length}%4d med=${med}%6d ms " +
        f"max=${ds.last}%6d ms ratio=${ds.last.toDouble / med}%7.2f  " +
        names.getOrDefault(sid, "?").take(90))
    }
    spark.stop()
  }
}
