package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{DimDate, Profiler, Warehouse}
import graft.sources.{Readers, Writers}

/** The full reference pipeline, composed in-process: staging parquet →
  * star-schema warehouse parquet (+ per-table profiling), replacing the
  * reference's three Airflow DAGs (`vcapital_staging`,
  * `vcapital_warehouse`, `profiling_quality_pipeline`) with one
  * [[Pipeline.Runner]] graph.
  *
  * Differences from the reference's architecture, by design:
  *  - one SparkSession for the whole graph — shared dims (dim_company
  *    feeds three facts) are built once and memoized, where the
  *    reference re-reads dim tables over JDBC in every per-table job
  *    (SURVEY §4 caching row);
  *  - skip-on-empty short-circuits per stage, as the reference does per
  *    job (P3);
  *  - incremental mode is a declarative `created_at` day filter pushed
  *    into each staging scan (S2), not interpolated SQL.
  */
object VcPipeline {

  case class Config(
      stagingDir: String,
      outDir: String,
      /** when set (yyyy-MM-dd execution date), only staging rows created
        * the previous day flow through — the reference's incremental
        * mode (extract.py:41-43). */
      incrementalDs: Option[String] = None)

  private val StagingTables = Seq(
    "company", "funds", "people", "relationships",
    "investments", "funding_rounds", "ipos", "acquisition", "milestones")

  def run(spark: SparkSession, cfg: Config,
          notifier: (String, Throwable) => Unit = (_, _) => ()): Map[String, Pipeline.Result] = {
    def staging(name: String): DataFrame = {
      val df = Readers.parquet(spark, s"${cfg.stagingDir}/$name.parquet")
      cfg.incrementalDs match {
        case Some(ds) if df.columns.contains("created_at") =>
          Readers.incremental(df, "created_at", ds)
        case _ => df
      }
    }
    def sink(name: String)(df: DataFrame): Unit =
      Writers.parquetOverwrite(df, s"${cfg.outDir}/$name")

    val runner = new Pipeline.Runner(notifier)
    // sources
    StagingTables.foreach { t =>
      runner.add(Pipeline.Stage(s"stg_$t", Nil, _ => staging(t)))
    }
    // dims
    runner
      .add(Pipeline.Stage("dim_date", Nil,
        _ => DimDate.build(spark), sink("dim_date"), skipWhenEmpty = false))
      .add(Pipeline.Stage("dim_company", Seq("stg_company"),
        f => Warehouse.withDenseKey(Warehouse.dimCompany(f("stg_company")),
          "sk_company_id", "nk_company_id"),
        sink("dim_company")))
      .add(Pipeline.Stage("dim_funds", Seq("stg_funds", "dim_date"),
        f => Warehouse.withDenseKey(Warehouse.dimFunds(f("stg_funds"), f("dim_date")),
          "sk_fund_id", "nk_fund_id"),
        sink("dim_funds")))
      .add(Pipeline.Stage("dim_people", Seq("stg_people"),
        f => Warehouse.withDenseKey(Warehouse.dimPeople(f("stg_people")),
          "sk_people_id", "nk_people_id"),
        sink("dim_people")))
    // facts + bridge
    runner
      .add(Pipeline.Stage("fct_investments",
        Seq("stg_investments", "dim_company", "dim_funds", "dim_date", "stg_funding_rounds"),
        f => Warehouse.fctInvestments(f("stg_investments"), f("dim_company"),
          f("dim_funds"), f("dim_date"), f("stg_funding_rounds")),
        sink("fct_investments")))
      .add(Pipeline.Stage("fct_ipos", Seq("stg_ipos", "dim_company", "dim_date"),
        f => Warehouse.fctIpos(f("stg_ipos"), f("dim_company"), f("dim_date")),
        sink("fct_ipos")))
      .add(Pipeline.Stage("fct_acquisition", Seq("stg_acquisition", "dim_company", "dim_date"),
        f => Warehouse.fctAcquisition(f("stg_acquisition"), f("dim_company"), f("dim_date")),
        sink("fct_acquisition")))
      .add(Pipeline.Stage("bridge_company_people",
        Seq("stg_relationships", "dim_company", "dim_people"),
        f => Warehouse.bridgeCompanyPeople(f("stg_relationships"),
          f("dim_company"), f("dim_people")),
        sink("bridge_company_people")))
    // milestones: keyed upsert of the day's delta into the persistent
    // snapshot — the reference's pangres `if_row_exists='update'` into
    // staging.milestones (staging load.py:94-118; PK per init_stg.sql
    // milestones_pkey = milestone_id). Lake-side: merge-by-key with the
    // newest updated_at winning, delta preferred on ties, written back
    // via a rename swap (the snapshot is both input and output).
    runner.add(Pipeline.Stage("milestones", Seq("stg_milestones"),
      f => {
        val delta = f("stg_milestones")
        val snapshot = s"${cfg.outDir}/milestones"
        val p = new org.apache.hadoop.fs.Path(snapshot)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val existing =
          if (fs.exists(p)) Readers.parquet(spark, snapshot) else delta.limit(0)
        graft.sources.JdbcUpsert.mergeByKey(existing, delta,
          Seq("milestone_id"), "updated_at")
      },
      df => graft.sources.Writers.parquetReplace(df, s"${cfg.outDir}/milestones")))
    // profiling over the produced dims/facts (reference: third DAG)
    runner.add(Pipeline.Stage("profiling",
      Seq("dim_company", "dim_funds", "fct_investments"),
      f => Seq("dim_company", "dim_funds", "fct_investments")
        .map(t => Profiler.profile(f(t), "warehouse", t))
        .reduce(_ unionByName _),
      sink("data_profile"), skipWhenEmpty = false))

    runner.run()
  }
}
