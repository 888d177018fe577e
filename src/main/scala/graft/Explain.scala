package graft

/** Plan-audit main: prints the formatted physical plan of selected
  * queries (all, or names given as args after the sf dir). Used to check
  * that filters/projections reach the parquet scan (PushedFilters /
  * ReadSchema), small dims broadcast, and operators stay inside
  * WholeStageCodegen. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val spark = graft.core.GraftSession.get()
    SparkEntry.queries
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
