package graft.tools

import java.nio.file.{Files, Paths}

/** r20 deliverable helper: write each named query's formatted physical
  * plan to `<outDir>/<query>_<suffix>.txt`. Suffix comes from
  * SPARK_GRAFT_PLAN_SUFFIX (e.g. "before" with SPARK_GRAFT_FANOUT_CAP=1,
  * which disables the round's only plan-shape change and reproduces the
  * pre-change plans; "after" with defaults).
  *
  *   runMain graft.tools.DumpPlans <sfDir> <outDir> <query...>
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    val names = args.drop(2).toSeq
    Files.createDirectories(outDir)
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "after")
    val spark = graft.core.GraftSession.get()
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val out = outDir.resolve(s"${name}_$suffix.txt")
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(out, plan)
        println(s"[plans] wrote $out (${plan.length} chars)")
      } catch {
        case e: Throwable =>
          Files.writeString(out, s"explain failed: ${e.getMessage}")
          println(s"[plans] FAILED $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
