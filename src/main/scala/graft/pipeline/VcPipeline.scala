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
      incrementalDs: Option[String] = None,
      /** incremental APPEND into an existing warehouse — the reference's
        * BIGSERIAL-continuation semantics (init_dwh.sql:32, warehouse
        * load.py append): dims gain only unseen natural keys with dense
        * surrogate keys continuing from the stored max; facts are built
        * against the FULL dims and merged on their degenerate natural id,
        * so replaying a day is idempotent. false = full overwrite. */
      appendMode: Boolean = false)

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
    def stored(name: String): Option[DataFrame] = {
      val p = new org.apache.hadoop.fs.Path(s"${cfg.outDir}/$name")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) Some(Readers.parquet(spark, p.toString)) else None
    }
    /** Append-with-continued-keys (reference BIGSERIAL semantics): only
      * natural keys unseen in the stored dim get rows, keyed densely from
      * the stored max surrogate key; the returned frame is the FULL dim,
      * so downstream facts resolve complete key lookups. Idempotent: a
      * replayed day finds no unseen keys. */
    def dimFrame(name: String, sk: String, nk: String, delta: DataFrame): DataFrame =
      (if (cfg.appendMode) stored(name) else None) match {
        case None => Warehouse.withDenseKey(delta, sk, nk)
        case Some(existing) =>
          import org.apache.spark.sql.functions.{col, max}
          val maxKey = Option(existing.agg(max(col(sk))).first().get(0))
            .map(_.asInstanceOf[Long]).getOrElse(0L)
          val fresh = delta.join(existing.select(col(nk)), Seq(nk), "left_anti")
          existing.unionByName(Warehouse.withDenseKey(fresh, sk, nk, offset = maxKey))
      }
    /** Fact/bridge append: merge the day's rows into the stored table on
      * the degenerate natural key — delta wins on ties, so replaying a
      * day replaces its own rows instead of duplicating them. */
    def factFrame(name: String, keys: Seq[String], newRows: DataFrame): DataFrame =
      (if (cfg.appendMode) stored(name) else None) match {
        case None => newRows
        case Some(existing) =>
          graft.sources.JdbcUpsert.mergeByKey(existing, newRows, keys, keys.head)
      }
    /** Warehouse-table stage. Overwrite mode sinks after the emptiness
      * check, as before. Append mode PUBLISHES inside the build — swap
      * the snapshot, then hand downstream a fresh read of the new files —
      * because the merged frame lazily reads the files the swap replaces:
      * a post-sink consumer of the old frame would hit deleted parts. */
    def tableStage(name: String, deps: Seq[String],
                   frame: Map[String, DataFrame] => DataFrame): Pipeline.Stage =
      if (cfg.appendMode)
        Pipeline.Stage(name, deps, f => {
          Writers.parquetReplace(frame(f), s"${cfg.outDir}/$name")
          Readers.parquet(spark, s"${cfg.outDir}/$name")
        })
      else Pipeline.Stage(name, deps, frame, sink(name))

    val runner = new Pipeline.Runner(notifier)
    // sources
    StagingTables.foreach { t =>
      runner.add(Pipeline.Stage(s"stg_$t", Nil, _ => staging(t)))
    }
    // dims
    runner
      .add(Pipeline.Stage("dim_date", Nil,
        _ => DimDate.build(spark), sink("dim_date"), skipWhenEmpty = false))
      .add(tableStage("dim_company", Seq("stg_company"),
        f => dimFrame("dim_company", "sk_company_id", "nk_company_id",
          Warehouse.dimCompany(f("stg_company")))))
      .add(tableStage("dim_funds", Seq("stg_funds", "dim_date"),
        f => dimFrame("dim_funds", "sk_fund_id", "nk_fund_id",
          Warehouse.dimFunds(f("stg_funds"), f("dim_date")))))
      .add(tableStage("dim_people", Seq("stg_people"),
        f => dimFrame("dim_people", "sk_people_id", "nk_people_id",
          Warehouse.dimPeople(f("stg_people")))))
    // facts + bridge
    runner
      .add(tableStage("fct_investments",
        Seq("stg_investments", "dim_company", "dim_funds", "dim_date", "stg_funding_rounds"),
        f => factFrame("fct_investments", Seq("dd_investment_id"),
          Warehouse.fctInvestments(f("stg_investments"), f("dim_company"),
            f("dim_funds"), f("dim_date"), f("stg_funding_rounds")))))
      .add(tableStage("fct_ipos", Seq("stg_ipos", "dim_company", "dim_date"),
        f => factFrame("fct_ipos", Seq("dd_ipo_id"),
          Warehouse.fctIpos(f("stg_ipos"), f("dim_company"), f("dim_date")))))
      .add(tableStage("fct_acquisition", Seq("stg_acquisition", "dim_company", "dim_date"),
        f => factFrame("fct_acquisition", Seq("dd_acquisition_id"),
          Warehouse.fctAcquisition(f("stg_acquisition"), f("dim_company"), f("dim_date")))))
      .add(tableStage("bridge_company_people",
        Seq("stg_relationships", "dim_company", "dim_people"),
        f => factFrame("bridge_company_people",
          Seq("sk_company_id", "sk_people_id", "relationship_start_at"),
          Warehouse.bridgeCompanyPeople(f("stg_relationships"),
            f("dim_company"), f("dim_people")))))
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
