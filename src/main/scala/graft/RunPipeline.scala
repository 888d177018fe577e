package graft

/** CLI entry for the full warehouse pipeline:
  *
  *   tools/run-main.sh graft.RunPipeline <stagingDir> <outDir> [ds]
  *
  * `ds` (yyyy-MM-dd) switches to incremental mode — only staging rows
  * created on ds-1 flow through (the reference's daily micro-batch). */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunPipeline <stagingDir> <outDir> [ds]")
    val spark = graft.core.GraftSession.get()
    val cfg = graft.pipeline.VcPipeline.Config(
      stagingDir = args(0), outDir = args(1),
      incrementalDs = args.lift(2))
    val results = graft.pipeline.VcPipeline.run(spark, cfg,
      notifier = (stage, e) => System.err.println(s"[pipeline] $stage FAILED: ${e.getMessage}"))
    results.toSeq.sortBy(_._1).foreach { case (stage, r) =>
      println(f"[pipeline] $stage%-24s $r")
    }
    val failed = results.values.count(_.isInstanceOf[graft.pipeline.Pipeline.Errored])
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
