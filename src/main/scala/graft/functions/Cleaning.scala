package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataTypes, StringType}

/** Scalar cleansing/derivation library — the engine's equivalents of the
  * reference's column-expression builders (SURVEY §2.2, §2.9).
  *
  * Everything here is a pure `Column` combinator over
  * `org.apache.spark.sql.functions` — no UDFs — so every operator stays
  * inside Catalyst (predicate pushdown through them where legal) and
  * whole-stage codegen. That is the property that makes these safe in the
  * hot path of a 100 TB scan.
  *
  * Reference citations (all under /root/reference/):
  *  - cleanAddress: `dags/vcapital_warehouse/tasks/components/helper/transform.py:45-88`
  *  - toUsd: `helper/transform.py:91-116`
  *  - entityType: `extract_transform.py:64-70`
  *  - fullAddress: `extract_transform.py:76-92`
  *  - normalizeOrNull: `extract_transform.py:94-119`
  *  - cleanStockSymbol: `extract_transform.py:416-420`
  *  - scrubNewlines: `extract.py:61-64`
  *  - dateKey: `extract_transform.py:194-197`
  */
object Cleaning {

  /** Empty-or-null → NULL, else the (already transformed) value.
    * Mirrors the reference's pervasive `when(isNull | == "")` guard. */
  def nullIfBlank(c: Column): Column =
    when(c.isNull || c === lit(""), lit(null).cast(StringType)).otherwise(c)

  /** trim+lower then blank→NULL (region/city normalization, P6). */
  def normalizeLower(c: Column): Column = nullIfBlank(trim(lower(c)))

  /** trim+upper then blank→NULL (country_code normalization, P6). */
  def normalizeUpper(c: Column): Column = nullIfBlank(trim(upper(c)))

  /** Entity type from object-id prefix (P4):
    * "c:" → company, "f:" → fund, else NULL. */
  def entityType(objectId: Column): Column =
    when(objectId.startsWith("c:"), lit("company"))
      .when(objectId.startsWith("f:"), lit("fund"))
      .otherwise(lit(null).cast(StringType))

  /** Address cleanser (P7). Semantics from transform.py:45-88:
    *  1. lowercase
    *  2. strip leading '#' / '.' runs
    *  3. NULL if the remainder is only symbols/digits/underscore
    *  4. NULL if trimmed length <= 2
    *  5. else trimmed value
    */
  def cleanAddress(c: Column): Column = {
    val lowered  = lower(c)
    val stripped = regexp_replace(lowered, "^[#.]+", "")
    val trimmed  = trim(stripped)
    when(c.isNull, lit(null).cast(StringType))
      .when(stripped.rlike("^[\\W\\d_]+$"), lit(null).cast(StringType))
      .when(length(trimmed) <= 2, lit(null).cast(StringType))
      .otherwise(trimmed)
  }

  /** full_address 4-branch coalescing concat (P5):
    * both null/blank → NULL; one side null/blank → the other; else
    * concat_ws(", ", a1, a2). */
  def fullAddress(a1: Column, a2: Column): Column = {
    val c1 = nullIfBlank(a1)
    val c2 = nullIfBlank(a2)
    when(c1.isNull && c2.isNull, lit(null).cast(StringType))
      .when(c1.isNull, c2)
      .when(c2.isNull, c1)
      .otherwise(concat_ws(", ", c1, c2))
  }

  /** Hard-coded FX table from transform.py:95-102. A broadcast-map-join
    * would also work, but 8 literals fold into a codegen'd CASE chain,
    * which is strictly cheaper at scale (no join, no shuffle). */
  val FxRates: Seq[(String, Double)] = Seq(
    "USD" -> 1.0, "CAD" -> 0.72, "EUR" -> 1.14, "SEK" -> 0.10,
    "AUD" -> 0.64, "JPY" -> 0.007, "GBP" -> 1.33, "NIS" -> 0.28)

  /** Currency → USD conversion (P8): 8-branch CASE * rate, fallback =
    * amount unchanged, round(2). Decimal in/decimal out for oracle parity
    * (reference arithmetic is on numeric(15,2)). */
  def toUsd(currency: Column, amount: Column): Column = {
    val dec = amount.cast(DataTypes.createDecimalType(18, 2))
    val converted = FxRates.foldLeft(when(lit(false), dec)) {
      case (acc, (code, rate)) =>
        acc.when(currency === code, dec * lit(BigDecimal(rate)))
    }.otherwise(dec)
    round(converted, 2).cast(DataTypes.createDecimalType(18, 2))
  }

  /** Stock-symbol cleanse (P9): trim+lower; symbol/digit-only → NULL. */
  def cleanStockSymbol(c: Column): Column = {
    val t = trim(lower(c))
    when(c.isNull, lit(null).cast(StringType))
      .when(t.rlike("^[\\W\\d_]+$"), lit(null).cast(StringType))
      .otherwise(t)
  }

  /** Newline scrub over every string column (P10/P11). The reference does
    * this per-table before persisting (extract.py:61-64); one fold keeps it
    * a single narrow projection — no extra stage. */
  def scrubNewlines(df: DataFrame): DataFrame = {
    val stringCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    stringCols.foldLeft(df) { (d, name) =>
      d.withColumn(name, regexp_replace(col(name), "\n", " "))
    }
  }

  /** yyyyMMdd int date key (P12) — the star schema's date FK derivation. */
  def dateKey(ts: Column): Column =
    date_format(ts, "yyyyMMdd").cast(DataTypes.IntegerType)
}
