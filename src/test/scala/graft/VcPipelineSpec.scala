package graft

import java.nio.file.Files
import java.sql.{Date, Timestamp}
import org.apache.spark.sql.functions._
import graft.pipeline.{Pipeline, VcPipeline}

/** End-to-end pipeline integration over FIXTURES.md-style staging data:
  * full run, skip-on-empty propagation, and incremental-day filtering. */
class VcPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Write a small, edge-case-bearing staging area; returns its dir. */
  private def writeStaging(emptyAcquisition: Boolean = false): String = {
    val dir = Files.createTempDirectory("vc_staging").toString
    def put(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")

    put("company", Seq(
      ("c:1", "#12 Market St", "Suite 4", "SF", "Bay", "us", ts("2020-01-01 10:00:00")),
      ("c:2", "AB", "", "NY", "", "us", ts("2020-01-02 10:00:00")),
      ("f:3", "Fund HQ", null, "LDN", "London", "gb", ts("2020-01-02 11:00:00"))
    ).toDF("object_id", "address1", "address2", "region", "city", "country_code", "created_at"))

    put("funds", Seq(
      ("fd1", "f:3", " Alpha Fund ", Date.valueOf("2004-02-28"),
        BigDecimal("100.00"), "EUR", " desc ", ts("2020-01-02 09:00:00"))
    ).toDF("fund_id", "object_id", "name", "funded_at", "raised_amount",
      "raised_currency_code", "source_description", "created_at"))

    put("people", Seq(
      ("p1", "p:1", "Ada", "Lovelace", "London", "Analytical", ts("2020-01-01 08:00:00"))
    ).toDF("people_id", "object_id", "first_name", "last_name", "birthplace",
      "affiliation_name", "created_at"))

    put("relationships", Seq(
      ("r1", "p:1", "c:1", "2010-01-01", "2012-01-01", "no", "1", "CEO")
    ).toDF("relationship_id", "person_object_id", "relationship_object_id",
      "start_at", "end_at", "is_past", "sequence", "title"))

    put("investments", Seq(
      (1L, 10L, "c:1", "f:3", ts("2020-01-02 12:00:00")),
      (2L, 99L, "c:2", "f:3", ts("2020-01-01 12:00:00")), // missing round -> nulls
      (3L, 10L, "c:9", "f:3", ts("2020-01-01 12:00:00"))  // orphan company -> dropped
    ).toDF("investment_id", "funding_round_id", "funded_object_id",
      "investor_object_id", "created_at"))

    put("funding_rounds", Seq(
      (10L, Date.valueOf("2000-06-01"), "series-a", "3", BigDecimal("10.00"),
        "USD", BigDecimal("1.00"), BigDecimal("2.00"))
    ).toDF("funding_round_id", "funded_at", "funding_round_type", "participants",
      "raised_amount_usd", "raised_currency_code",
      "pre_money_valuation_usd", "post_money_valuation_usd"))

    put("ipos", Seq(
      ("7", "c:1", BigDecimal("500.00"), BigDecimal("100.00"), "GBP", "USD",
        ts("2010-05-04 00:00:00"), " NQ:ONE ", "first listing", ts("2020-01-01 09:00:00"))
    ).toDF("ipo_id", "object_id", "valuation_amount", "raised_amount",
      "valuation_currency_code", "raised_currency_code", "public_at",
      "stock_symbol", "source_description", "created_at"))

    val acq = if (emptyAcquisition) Seq.empty[(Long, String, String, String, BigDecimal, String, Timestamp, String)]
      else Seq((1L, "c:1", "c:2", "cash", BigDecimal("50.00"), "USD",
        ts("2011-01-01 00:00:00"), "deal"))
    put("acquisition", acq.toDF("acquisition_id", "acquiring_object_id",
      "acquired_object_id", "term_code", "price_amount", "price_currency_code",
      "acquired_at", "source_description"))

    put("milestones", milestonesDf(Seq(
      (1, "c:1", "first customer", ts("2020-01-01 08:00:00"), ts("2020-01-01 08:00:00")),
      (2, "c:2", "series a", ts("2020-01-02 08:00:00"), ts("2020-01-02 08:00:00")))))
    dir
  }

  private def milestonesDf(rows: Seq[(Int, String, String, Timestamp, Timestamp)]) =
    rows.toDF("milestone_id", "object_id", "description", "created_at", "updated_at")
      .select($"created_at", $"description", $"created_at".cast("string").as("milestone_at"),
        lit("m-code").as("milestone_code"), $"milestone_id", $"object_id",
        $"description".as("source_description"), lit(null).cast("string").as("source_url"),
        $"updated_at")

  test("full pipeline run produces the whole warehouse") {
    val out = Files.createTempDirectory("vc_out").toString
    val results = VcPipeline.run(spark, VcPipeline.Config(writeStaging(), out))
    assert(results.values.forall(r => r == Pipeline.Completed()),
      s"unexpected stage results: ${results.filterNot(_._2 == Pipeline.Completed())}")

    def read(t: String) = spark.read.parquet(s"$out/$t")
    assert(read("dim_date").count() == 29220)
    assert(read("dim_company").count() == 3)
    assert(read("fct_investments").count() == 2) // orphan dropped
    assert(read("fct_ipos").count() == 1)
    assert(read("fct_acquisition").count() == 1)
    assert(read("bridge_company_people").count() == 1)
    // FK integrity: every fact sk resolves into its dim
    val dimC = read("dim_company").select("sk_company_id")
    assert(read("fct_investments").join(dimC, Seq("sk_company_id"), "left_anti").count() == 0)
    // profiling covered the three profiled tables
    assert(read("data_profile").select("table_name").distinct().count() == 3)
  }

  test("milestones: keyed upsert across runs, delta wins, idempotent replay") {
    val out = Files.createTempDirectory("vc_out_ms").toString
    val staging = writeStaging()
    assert(VcPipeline.run(spark, VcPipeline.Config(staging, out))("milestones")
      == Pipeline.Completed())
    def snapshot() = spark.read.parquet(s"$out/milestones")
      .select("milestone_id", "description", "updated_at")
      .orderBy("milestone_id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(snapshot() == Seq((1, "first customer"), (2, "series a")))

    // day 2: milestone 1 updated (newer updated_at), milestone 3 new
    milestonesDf(Seq(
      (1, "c:1", "first customer REVISED", ts("2020-01-01 08:00:00"), ts("2020-01-05 08:00:00")),
      (3, "f:3", "fund closed", ts("2020-01-05 08:00:00"), ts("2020-01-05 08:00:00"))))
      .write.mode("overwrite").parquet(s"$staging/milestones.parquet")
    assert(VcPipeline.run(spark, VcPipeline.Config(staging, out))("milestones")
      == Pipeline.Completed())
    val day2 = Seq((1, "first customer REVISED"), (2, "series a"), (3, "fund closed"))
    assert(snapshot() == day2)

    // replaying day 2 must not change the snapshot (same keys, same
    // versions — delta rows deterministically replace their twins)
    assert(VcPipeline.run(spark, VcPipeline.Config(staging, out))("milestones")
      == Pipeline.Completed())
    assert(snapshot() == day2)
  }

  test("empty staging table skips its stage and dependents only") {
    val out = Files.createTempDirectory("vc_out_skip").toString
    val results = VcPipeline.run(spark,
      VcPipeline.Config(writeStaging(emptyAcquisition = true), out))
    assert(results("stg_acquisition") == Pipeline.Skipped)
    assert(results("fct_acquisition") == Pipeline.Skipped)
    assert(results("fct_investments") == Pipeline.Completed())
    assert(!Files.exists(java.nio.file.Paths.get(s"$out/fct_acquisition")))
  }

  test("append mode: two-day replay, continued dense keys, idempotent day 2") {
    val out = Files.createTempDirectory("vc_out_append").toString
    val staging = writeStaging()
    def dimC() = spark.read.parquet(s"$out/dim_company")
      .select("sk_company_id", "nk_company_id").orderBy("sk_company_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    // day 1 (ds 2020-01-02 keeps rows created 2020-01-01): company c:1
    VcPipeline.run(spark, VcPipeline.Config(staging, out,
      incrementalDs = Some("2020-01-02"), appendMode = true))
    assert(dimC() == Seq((1L, "c:1")))

    // day 2: c:2 and f:3 append with keys continuing from the stored max;
    // the day's investments resolve against the FULL dim (c:1 from day 1)
    VcPipeline.run(spark, VcPipeline.Config(staging, out,
      incrementalDs = Some("2020-01-03"), appendMode = true))
    val day2Keys = Seq((1L, "c:1"), (2L, "c:2"), (3L, "f:3"))
    assert(dimC() == day2Keys)
    assert(spark.read.parquet(s"$out/fct_investments").count() == 1)

    // replay of day 2 is idempotent: no duplicate keys, no duplicate facts
    VcPipeline.run(spark, VcPipeline.Config(staging, out,
      incrementalDs = Some("2020-01-03"), appendMode = true))
    assert(dimC() == day2Keys)
    assert(spark.read.parquet(s"$out/fct_investments").count() == 1)
    // key density: surrogate keys are exactly 1..n with no gaps
    val sks = dimC().map(_._1)
    assert(sks == (1L to sks.length))
  }

  test("incremental mode keeps only rows created on ds-1") {
    val out = Files.createTempDirectory("vc_out_incr").toString
    val results = VcPipeline.run(spark,
      VcPipeline.Config(writeStaging(), out, incrementalDs = Some("2020-01-03")))
    // company rows created 2020-01-02: c:2 and f:3 -> dim_company has 2
    assert(spark.read.parquet(s"$out/dim_company").count() == 2)
    // investments created 2020-01-02: id 1 only; its company c:1 was NOT
    // re-extracted that day -> inner join drops it -> empty fact skipped
    assert(results("fct_investments") == Pipeline.Skipped)
  }
}
