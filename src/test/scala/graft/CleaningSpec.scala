package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.functions.Cleaning

/** Truth-table tests for the scalar cleansing library (SURVEY §5.1);
  * semantics derived from reference `helper/transform.py` and
  * `extract_transform.py`. */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private def one(col: org.apache.spark.sql.Column): Any =
    spark.range(1).select(col.as("v")).collect()(0).get(0)

  test("cleanAddress truth table") {
    val cases = Seq(
      "#.#123 Main St"  -> "123 main st",  // leading #/. stripped, lowered
      "#123-456"        -> null,           // symbols/digits only after strip
      "AB"              -> null,           // len <= 2
      "  .. Main St 5 " -> ".. main st 5", // leading ws blocks the ^[#.]+ strip (transform.py:64)
      "Main St 5"       -> "main st 5",
      "$$$"             -> null,
      "..a"             -> null,           // strip dots -> "a", len 1
      null.asInstanceOf[String] -> null
    )
    val df = cases.map(_._1).toDF("a")
      .withColumn("c", Cleaning.cleanAddress($"a"))
    val got = df.select("c").collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    val want = Array("123 main st", null, null, ".. main st 5", "main st 5", null, null, null)
    assert(got.toSeq == want.toSeq)
  }

  test("toUsd applies all 8 rates, fallback, and 2dp rounding") {
    val rows = (Cleaning.FxRates :+ ("XXX" -> 1.0)).map { case (code, _) => (code, BigDecimal("100.00")) }
    val df = rows.toDF("cur", "amt")
      .withColumn("usd", Cleaning.toUsd($"cur", $"amt"))
    val got = df.select("cur", "usd").collect()
      .map(r => r.getString(0) -> r.getDecimal(1).toString).toMap
    assert(got("USD") == "100.00" && got("CAD") == "72.00" && got("EUR") == "114.00")
    assert(got("SEK") == "10.00" && got("AUD") == "64.00" && got("JPY") == "0.70")
    assert(got("GBP") == "133.00" && got("NIS") == "28.00" && got("XXX") == "100.00")
    // rounding: 99.999 JPY = 0.699993 -> 0.70
    val r = one(Cleaning.toUsd(lit("JPY"), lit(BigDecimal("99.99"))))
    assert(r.toString == "0.70")
  }

  test("entityType prefixes") {
    assert(one(Cleaning.entityType(lit("c:12"))) == "company")
    assert(one(Cleaning.entityType(lit("f:12"))) == "fund")
    assert(one(Cleaning.entityType(lit("x:12"))) == null)
  }

  test("fullAddress four branches") {
    assert(one(Cleaning.fullAddress(lit(null).cast("string"), lit(null).cast("string"))) == null)
    assert(one(Cleaning.fullAddress(lit(""), lit("b"))) == "b")
    assert(one(Cleaning.fullAddress(lit("a"), lit(null).cast("string"))) == "a")
    assert(one(Cleaning.fullAddress(lit("a"), lit("b"))) == "a, b")
  }

  test("normalize and stock symbol") {
    assert(one(Cleaning.normalizeLower(lit("  MiXeD "))) == "mixed")
    assert(one(Cleaning.normalizeUpper(lit(" gb "))) == "GB")
    assert(one(Cleaning.normalizeLower(lit("   "))) == null)
    assert(one(Cleaning.cleanStockSymbol(lit(" NASDAQ:AAPL "))) == "nasdaq:aapl")
    assert(one(Cleaning.cleanStockSymbol(lit("123"))) == null)
  }

  test("scrubNewlines hits every string column only") {
    val df = Seq((1L, "a\nb", "c\nd")).toDF("id", "x", "y")
    val got = Cleaning.scrubNewlines(df).collect()(0)
    assert(got == Row(1L, "a b", "c d"))
  }

  test("dateKey yyyyMMdd int") {
    assert(one(Cleaning.dateKey(to_timestamp(lit("2004-02-28 10:00:00")))) == 20040228)
  }

  test("cleanAddress idempotence (property)") {
    val addrs = Seq("#12 Foo", "..bar", "NO clean", "x", "#.", "Av. 9 de Julio").toDF("a")
    val once  = addrs.select(Cleaning.cleanAddress($"a").as("c"))
    val twice = once.select(Cleaning.cleanAddress($"c").as("c"))
    assert(once.collect().toSeq == twice.collect().toSeq)
  }
}
