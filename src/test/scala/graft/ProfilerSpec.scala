package graft

import graft.operators.Profiler
import org.apache.spark.sql.functions._

/** Profiler semantics vs hand-computed values (SURVEY §5.5):
  * completeness threshold straddling, negative detection, bounded sample. */
class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1, Some("a"), Some(-5.0)),
    (2, Some("b"), Some(1.0)),
    (3, None, Some(2.0)),
    (4, Some("d"), Some(3.0)),
    (5, Some("e"), Some(4.0)),
    (6, Some("f"), Some(5.0)),
    (7, Some("g"), Some(6.0)),
    (8, Some("h"), Some(7.0)),
    (9, Some("i"), Some(8.0)),
    (10, Some("j"), None)
  ).toDF("id", "s", "v")

  test("profile: completeness, grade threshold at 90, negatives, sample") {
    val p = Profiler.profile(df, "sch", "t").orderBy("ordinal").collect()
    assert(p.length == 3)
    val id = p(0); val s = p(1); val v = p(2)
    assert(id.getAs[Long]("n_rows") == 10 && id.getAs[Int]("n_cols") == 3)
    assert(id.getAs[Double]("percentage_completeness") == 100.0)
    assert(id.getAs[String]("completeness_grade") == "Good")
    // s: 9/10 = 90% -> NOT > 90 -> Bad (reference threshold is strict >)
    assert(s.getAs[Long]("not_null_count") == 9)
    assert(s.getAs[String]("completeness_grade") == "Bad")
    assert(s.getAs[Long]("negative_count") == 0 && !s.getAs[Boolean]("is_negative_values"))
    // v: one negative
    assert(v.getAs[Long]("negative_count") == 1 && v.getAs[Boolean]("is_negative_values"))
    // sample: 5 smallest distinct as strings
    assert(id.getAs[String]("sample_data") == "1,10,2,3,4")
    assert(s.getAs[String]("sample_data") == "a,b,d,e,f")
  }

  test("profile of empty table: completeness 0, Bad") {
    val empty = df.filter(col("id") < 0)
    val p = Profiler.profile(empty, "sch", "t").orderBy("ordinal").collect()
    assert(p.forall(_.getAs[Long]("n_rows") == 0))
    assert(p.forall(_.getAs[Double]("percentage_completeness") == 0.0))
    assert(p.forall(_.getAs[String]("completeness_grade") == "Bad"))
    assert(p.forall(_.getAs[String]("sample_data") == ""))
  }

  test("qualityReport JSON survives commas/quotes/backslashes in sample values") {
    val tricky = Seq((1, "a, b"), (2, "say \"hi\""), (3, "back\\slash")).toDF("id", "s")
    val r = Profiler.qualityReport(tricky, "sch", "t").collect()(0)
    val profile = r.getAs[String]("data_profile")
    // must parse as JSON and preserve the 3 values of column s intact
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(profile)
    val samples = node.get("s").get("sample_data")
    assert(samples.size() == 3)
    val vals = (0 until 3).map(samples.get(_).asText()).toSet
    assert(vals == Set("a, b", "say \"hi\"", "back\\slash"))
  }

  test("qualityReport emits well-formed JSON documents") {
    val r = Profiler.qualityReport(df, "sch", "t").collect()(0)
    val profile = r.getAs[String]("data_profile")
    val quality = r.getAs[String]("data_quality")
    assert(profile.startsWith("{\"id\":{\"data_type\":\"int\""))
    assert(quality.contains("\"s\":{\"percentage_completeness\":90.00"))
    assert(quality.contains("\"data_quality_completeness_result\":\"Bad\""))
    assert(quality.contains("\"v\":{\"percentage_completeness\":90.00"))
    assert(quality.contains("\"is_negative_values\":true"))
  }
}
