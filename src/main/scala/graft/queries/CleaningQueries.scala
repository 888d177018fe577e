package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Cleaning

/** Scalar-operator coverage (SURVEY §2.2 P1–P13) expressed over the
  * TPC-H-ish testdata. The staging columns the reference cleans
  * (addresses, currencies, object-id prefixes) don't exist in the
  * testdata, so each query first derives a deterministic stand-in column
  * (same CASE in the DuckDB oracle), then applies the engine function —
  * the function under test is the engine's `Cleaning` library, and every
  * branch is exercised by construction.
  */
object CleaningQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1: column-pruned projection with rename (dim build final select).
    "p1_project_rename" -> { (s, d) =>
      customer(s, d)
        .select(col("c_custkey").as("nk_customer_id"),
                col("c_name").as("customer_name"),
                col("c_mktsegment").as("segment"))
        .orderBy(col("nk_customer_id"))
    },

    // P4: entity_type CASE-chain on object-id prefix.
    "p4_entity_type" -> { (s, d) =>
      val objectId = when(col("c_custkey") % 3 === 0, concat(lit("c:"), col("c_custkey")))
        .when(col("c_custkey") % 3 === 1, concat(lit("f:"), col("c_custkey")))
        .otherwise(col("c_custkey").cast("string"))
      customer(s, d)
        .select(col("c_custkey"), objectId.as("object_id"))
        .withColumn("entity_type", Cleaning.entityType(col("object_id")))
        .orderBy(col("c_custkey"))
    },

    // P5: full_address 4-branch coalescing concat.
    "p5_full_address" -> { (s, d) =>
      val a1 = when(col("c_custkey") % 4 === 0, lit(null).cast("string"))
        .when(col("c_custkey") % 4 === 1, lit(""))
        .otherwise(concat(lit("addr1 "), col("c_name")))
      val a2 = when(col("c_custkey") % 3 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("addr2 "), col("c_mktsegment")))
      customer(s, d)
        .select(col("c_custkey"), a1.as("address1"), a2.as("address2"))
        .withColumn("full_address", Cleaning.fullAddress(col("address1"), col("address2")))
        .orderBy(col("c_custkey"))
    },

    // P6: normalize-or-null (trim+lower / trim+upper, blank→NULL).
    "p6_normalize_or_null" -> { (s, d) =>
      val raw = when(col("p_partkey") % 5 === 0, lit(""))
        .when(col("p_partkey") % 5 === 1, lit(null).cast("string"))
        .otherwise(concat(lit("  "), col("p_brand"), lit("  ")))
      part(s, d)
        .select(col("p_partkey"), raw.as("raw"))
        .withColumn("region_norm", Cleaning.normalizeLower(col("raw")))
        .withColumn("country_norm", Cleaning.normalizeUpper(col("raw")))
        .orderBy(col("p_partkey"))
    },

    // P7: clean_address (leading #/. strip, symbol-only NULL, len<=2 NULL).
    "p7_clean_address" -> { (s, d) =>
      val addr = when(col("p_partkey") % 5 === 0, concat(lit("#.#"), col("p_name")))
        .when(col("p_partkey") % 5 === 1, lit("#123-456"))
        .when(col("p_partkey") % 5 === 2, lit("AB"))
        .when(col("p_partkey") % 5 === 3, lit("  .. Main St 5  "))
        .otherwise(col("p_name"))
      part(s, d)
        .select(col("p_partkey"), addr.as("address"))
        .withColumn("clean_address", Cleaning.cleanAddress(col("address")))
        .orderBy(col("p_partkey"))
    },

    // P8: to_usd 8-branch FX CASE + fallback + round(2). Currency is a
    // deterministic function of the supplier key so every branch fires.
    "p8_to_usd" -> { (s, d) =>
      val codes = Cleaning.FxRates.map(_._1) :+ "XXX"
      val cur = codes.zipWithIndex.foldLeft(when(lit(false), lit(""))) {
        case (acc, (code, i)) => acc.when(col("l_suppkey") % 9 === i, lit(code))
      }.otherwise(lit("XXX"))
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
                cur.as("currency"),
                col("l_extendedprice").cast("decimal(18,2)").as("amount"))
        .withColumn("amount_usd",
          Cleaning.toUsd(col("currency"), col("amount")).cast("double"))
        .withColumn("amount", col("amount").cast("double"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("amount"), col("currency"))
    },

    // P9: stock-symbol cleanse (trim+lower, junk→NULL).
    "p9_stock_symbol" -> { (s, d) =>
      val sym = when(col("s_suppkey") % 4 === 0, lit("$$$"))
        .when(col("s_suppkey") % 4 === 1, lit("123"))
        .when(col("s_suppkey") % 4 === 2, concat(lit("  "), upper(col("s_name")), lit(" ")))
        .otherwise(col("s_name"))
      supplier(s, d)
        .select(col("s_suppkey"), sym.as("stock_symbol_raw"))
        .withColumn("stock_symbol", Cleaning.cleanStockSymbol(col("stock_symbol_raw")))
        .orderBy(col("s_suppkey"))
    },

    // P10: newline scrub across every string column of documents.
    "p10_scrub_newlines" -> { (s, d) =>
      val withNl = documents(s, d)
        .select(col("doc_id"),
                concat(col("text"), lit("\nline2\n")).as("text"),
                col("lang"), col("source"))
      Cleaning.scrubNewlines(withNl).orderBy(col("doc_id"))
    },

    // P12: type casts — yyyyMMdd int date-FK derivation + string→int cast.
    "p12_casts_date_key" -> { (s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
                Cleaning.dateKey(col("o_orderdate")).as("order_date_id"),
                col("o_orderkey").cast("string").cast("int").as("roundtrip_key"))
        .orderBy(col("o_orderkey"))
    },

    // P13: constant-column injection at fixed positions.
    "p13_constant_columns" -> { (s, d) =>
      region(s, d)
        .select(lit("officer_a").as("person_in_charge"),
                lit("warehouse_db").as("source"),
                col("r_regionkey"), col("r_name"))
        .orderBy(col("r_regionkey"))
    }
  )

  private val fxCase =
    """CASE l_suppkey % 9
      | WHEN 0 THEN 'USD' WHEN 1 THEN 'CAD' WHEN 2 THEN 'EUR' WHEN 3 THEN 'SEK'
      | WHEN 4 THEN 'AUD' WHEN 5 THEN 'JPY' WHEN 6 THEN 'GBP' WHEN 7 THEN 'NIS'
      | ELSE 'XXX' END""".stripMargin

  val oracle: Map[String, String] = Map(
    "p1_project_rename" ->
      """SELECT c_custkey AS nk_customer_id, c_name AS customer_name,
        |  c_mktsegment AS segment FROM customer ORDER BY nk_customer_id""".stripMargin,
    "p4_entity_type" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 3 = 0 THEN 'c:' || c_custkey
        |       WHEN c_custkey % 3 = 1 THEN 'f:' || c_custkey
        |       ELSE CAST(c_custkey AS VARCHAR) END AS object_id,
        |  CASE WHEN c_custkey % 3 = 0 THEN 'company'
        |       WHEN c_custkey % 3 = 1 THEN 'fund'
        |       ELSE NULL END AS entity_type
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "p5_full_address" ->
      """WITH src AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 4 = 0 THEN NULL
        |         WHEN c_custkey % 4 = 1 THEN ''
        |         ELSE 'addr1 ' || c_name END AS address1,
        |    CASE WHEN c_custkey % 3 = 0 THEN NULL
        |         ELSE 'addr2 ' || c_mktsegment END AS address2
        |  FROM customer)
        |SELECT c_custkey, address1, address2,
        |  CASE WHEN nullif(address1,'') IS NULL AND nullif(address2,'') IS NULL THEN NULL
        |       WHEN nullif(address1,'') IS NULL THEN nullif(address2,'')
        |       WHEN nullif(address2,'') IS NULL THEN nullif(address1,'')
        |       ELSE nullif(address1,'') || ', ' || nullif(address2,'') END AS full_address
        |FROM src ORDER BY c_custkey""".stripMargin,
    "p6_normalize_or_null" ->
      """WITH src AS (
        |  SELECT p_partkey,
        |    CASE WHEN p_partkey % 5 = 0 THEN ''
        |         WHEN p_partkey % 5 = 1 THEN NULL
        |         ELSE '  ' || p_brand || '  ' END AS raw
        |  FROM part)
        |SELECT p_partkey, raw,
        |  nullif(trim(lower(raw)), '') AS region_norm,
        |  nullif(trim(upper(raw)), '') AS country_norm
        |FROM src ORDER BY p_partkey""".stripMargin,
    "p7_clean_address" ->
      """WITH src AS (
        |  SELECT p_partkey,
        |    CASE WHEN p_partkey % 5 = 0 THEN '#.#' || p_name
        |         WHEN p_partkey % 5 = 1 THEN '#123-456'
        |         WHEN p_partkey % 5 = 2 THEN 'AB'
        |         WHEN p_partkey % 5 = 3 THEN '  .. Main St 5  '
        |         ELSE p_name END AS address
        |  FROM part),
        |st AS (
        |  SELECT p_partkey, address,
        |    regexp_replace(lower(address), '^[#.]+', '') AS stripped
        |  FROM src)
        |SELECT p_partkey, address,
        |  CASE WHEN address IS NULL THEN NULL
        |       WHEN regexp_matches(stripped, '^[\W\d_]+$') THEN NULL
        |       WHEN length(trim(stripped)) <= 2 THEN NULL
        |       ELSE trim(stripped) END AS clean_address
        |FROM st ORDER BY p_partkey""".stripMargin,
    "p8_to_usd" ->
      (s"""WITH src AS (
        |  SELECT l_orderkey, l_linenumber, $fxCase AS currency,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS amount
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, currency,
        |  CAST(amount AS DOUBLE) AS amount,
        |  CAST(CAST(round(
        |    CASE currency
        |      WHEN 'USD' THEN amount * 1.0 WHEN 'CAD' THEN amount * 0.72
        |      WHEN 'EUR' THEN amount * 1.14 WHEN 'SEK' THEN amount * 0.10
        |      WHEN 'AUD' THEN amount * 0.64 WHEN 'JPY' THEN amount * 0.007
        |      WHEN 'GBP' THEN amount * 1.33 WHEN 'NIS' THEN amount * 0.28
        |      ELSE amount END, 2) AS DECIMAL(18,2)) AS DOUBLE) AS amount_usd
        |FROM src ORDER BY l_orderkey, l_linenumber, amount, currency""").stripMargin,
    "p9_stock_symbol" ->
      """WITH src AS (
        |  SELECT s_suppkey,
        |    CASE WHEN s_suppkey % 4 = 0 THEN '$$$'
        |         WHEN s_suppkey % 4 = 1 THEN '123'
        |         WHEN s_suppkey % 4 = 2 THEN '  ' || upper(s_name) || ' '
        |         ELSE s_name END AS stock_symbol_raw
        |  FROM supplier)
        |SELECT s_suppkey, stock_symbol_raw,
        |  CASE WHEN stock_symbol_raw IS NULL THEN NULL
        |       WHEN regexp_matches(trim(lower(stock_symbol_raw)), '^[\W\d_]+$') THEN NULL
        |       ELSE trim(lower(stock_symbol_raw)) END AS stock_symbol
        |FROM src ORDER BY s_suppkey""".stripMargin,
    "p10_scrub_newlines" ->
      """SELECT doc_id,
        |  replace(text || chr(10) || 'line2' || chr(10), chr(10), ' ') AS text,
        |  replace(lang, chr(10), ' ') AS lang,
        |  replace(source, chr(10), ' ') AS source
        |FROM documents ORDER BY doc_id""".stripMargin,
    "p12_casts_date_key" ->
      """SELECT o_orderkey,
        |  CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS order_date_id,
        |  CAST(CAST(o_orderkey AS VARCHAR) AS INT) AS roundtrip_key
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "p13_constant_columns" ->
      """SELECT 'officer_a' AS person_in_charge, 'warehouse_db' AS source,
        |  r_regionkey, r_name FROM region ORDER BY r_regionkey""".stripMargin
  )
}
