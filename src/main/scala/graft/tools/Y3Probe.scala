package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Diagnostic harness for the y3_knn_graph bimodal-latency finding
  * (VERDICT r9 "What's wrong #1"): runs the y3 gate N times in one JVM
  * and prints, per run, the wall time plus the top stages by duration
  * with their max-task time and GC time — so a slow run can be
  * attributed to a straggler task, a skewed stage, GC, or scheduling.
  * Not part of the library surface; a bench-forensics tool only.
  */
object Y3Probe {
  final case class StageRec(id: Int, name: String, durMs: Long,
                            maxTaskMs: Long, gcMs: Long, tasks: Int)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "6").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stageStart = mutable.Map[Int, Long]()
    val stages = mutable.ArrayBuffer[StageRec]()
    val taskMax = mutable.Map[Int, Long]()
    val taskGc = mutable.Map[Int, Long]()
    val taskCnt = mutable.Map[Int, Int]()
    val listener = new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stageStart(s.stageInfo.stageId) = System.nanoTime()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        val sid = t.stageId
        val m = t.taskMetrics
        if (m != null) {
          val rt = m.executorRunTime
          taskMax(sid) = math.max(taskMax.getOrElse(sid, 0L), rt)
          taskGc(sid) = taskGc.getOrElse(sid, 0L) + m.jvmGCTime
          taskCnt(sid) = taskCnt.getOrElse(sid, 0) + 1
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
        val sid = s.stageInfo.stageId
        val dur = (System.nanoTime() - stageStart.getOrElse(sid, System.nanoTime())) / 1000000L
        stages += StageRec(sid, s.stageInfo.name.take(60), dur,
          taskMax.getOrElse(sid, 0L), taskGc.getOrElse(sid, 0L),
          taskCnt.getOrElse(sid, 0))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    spark.range(1000).selectExpr("sum(id)").collect()

    val fn = graft.SparkEntry.queries("y3_knn_graph")
    for (r <- 1 to runs) {
      stages.clear(); taskMax.clear(); taskGc.clear(); taskCnt.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async: give it a beat to drain before reading
      Thread.sleep(500)
      val top = stages.sortBy(-_.durMs).take(6)
      println(f"run=$r wall=$wall%.2f s rows=$n load=${scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ").head}")
      top.foreach(s => println(
        f"  stage=${s.id}%4d dur=${s.durMs}%6d ms maxTask=${s.maxTaskMs}%6d ms gcSum=${s.gcMs}%5d ms tasks=${s.tasks}%4d  ${s.name}"))
      System.gc()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
