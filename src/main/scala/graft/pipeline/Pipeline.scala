package graft.pipeline

import scala.collection.mutable
import scala.util.{Failure, Success, Try}
import org.apache.spark.sql.DataFrame

/** In-process pipeline graph runner — the engine's replacement for the
  * reference's Airflow DAG orchestration (SURVEY §3, `dags/<dag>/run.py`,
  * `tasks/main.py:59-120`): stage dependencies, skip-on-empty short-circuit
  * (P3, `extract.py:57-59`), and a pluggable failure notifier standing in
  * for the Slack webhook (`helper/slack_notifier.py`).
  *
  * Stages produce DataFrames lazily; a stage whose input is empty reports
  * `Skipped` without running its action — exactly the reference's
  * "No data to process" early return. Results are memoized so shared
  * upstream stages (e.g. dim_company feeding three facts) evaluate once
  * per run — the cross-job reuse the reference's job-per-script
  * architecture cannot express (SURVEY §4 caching row).
  */
object Pipeline {

  sealed trait Result
  case class Completed(rows: Option[Long] = None) extends Result
  case object Skipped extends Result
  case class Errored(error: Throwable) extends Result

  case class Stage(
      name: String,
      deps: Seq[String],
      build: Map[String, DataFrame] => DataFrame,
      sink: DataFrame => Unit = _ => (),
      skipWhenEmpty: Boolean = true)

  class Runner(notifier: (String, Throwable) => Unit = (_, _) => ()) {
    private val stages = mutable.LinkedHashMap.empty[String, Stage]
    private val frames = mutable.Map.empty[String, DataFrame]

    def add(stage: Stage): Runner = { stages(stage.name) = stage; this }

    /** Topologically run every stage; returns per-stage results. A failed
      * or skipped dependency skips its dependents. */
    def run(): Map[String, Result] = {
      val results = mutable.LinkedHashMap.empty[String, Result]

      def exec(name: String): Result = results.getOrElseUpdate(name, {
        val st = stages.getOrElse(name,
          throw new IllegalArgumentException(s"unknown stage: $name"))
        val depResults = st.deps.map(exec)
        if (depResults.exists(r => r == Skipped || r.isInstanceOf[Errored])) Skipped
        else Try {
          val df = st.build(frames.toMap)
          frames(name) = df
          if (st.skipWhenEmpty && df.isEmpty) Skipped
          else { st.sink(df); Completed() }
        } match {
          case Success(r) => r
          case Failure(e) => notifier(name, e); Errored(e)
        }
      })

      stages.keys.foreach(exec)
      results.toMap
    }
  }
}
