package graft.tools

import graft.SparkEntry

/** Dev tool: execute selected gate queries and print the FINAL adaptive
  * physical plan (after AQE stage planning), where runtime exchange/stage
  * reuse is visible — `explain` on an unexecuted AQE plan shows the
  * initial plan only, hiding ReusedExchange / reused shuffle stages.
  *
  *   runMain graft.tools.PlanProbe <sfDir> <query...>
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSet
    val spark = graft.core.GraftSession.get()
    SparkEntry.queries
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        val df = fn(spark, sfDir)
        val t0 = System.nanoTime()
        // collect() drives df's OWN QueryExecution (count() would plan a
        // separate query and leave df's adaptive plan un-finalized)
        val n = df.collect().length
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"\n========== $name rows=$n $sec%.2f s (final adaptive plan) ==========")
        println(df.queryExecution.executedPlan.toString)
      }
    spark.stop()
  }
}
