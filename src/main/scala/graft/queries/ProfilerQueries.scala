package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.SmallestKDistinct
import graft.operators.Profiler

/** Profiling/aggregation coverage (SURVEY §2.4 A1–A7). The testdata has
  * no NULLs, so completeness-grade branches are exercised by deterministic
  * null injection (mirrored in the oracle). */
object ProfilerQueries {

  /** documents with injected nulls: text 50% (Bad), lang 95% (Good). */
  private def docsWithNulls(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      when(col("doc_id") % 2 === 0, lit(null).cast("string"))
        .otherwise(col("text")).as("text"),
      when(col("doc_id") % 20 === 0, lit(null).cast("string"))
        .otherwise(col("lang")).as("lang"),
      col("source"),
      col("n_chars"))

  /** nation with injected nulls + negatives for the quality-report doc. */
  private def nationDirty(s: SparkSession, d: String): DataFrame =
    nation(s, d).select(
      col("n_nationkey"),
      when(col("n_nationkey") % 5 === 0, lit(null).cast("string"))
        .otherwise(col("n_name")).as("n_name"),
      when(col("n_nationkey") % 7 === 0, -col("n_regionkey") - 1)
        .otherwise(col("n_regionkey")).as("n_regionkey"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1: row count as a global aggregate, over several tables at once.
    "a1_table_counts" -> { (s, d) =>
      def one(name: String) =
        t(s, d, name).agg(count(lit(1)).as("n_rows")).select(lit(name).as("table_name"), col("n_rows"))
      Seq("region", "nation", "customer", "orders", "lineitem")
        .map(one).reduce(_ union _).orderBy(col("table_name"))
    },

    // A2+A3+A4: the full per-column profile in ONE pass (single-pass
    // replacement for the reference's per-metric SQL loop).
    "a2_profile_documents" -> { (s, d) =>
      Profiler.profile(docsWithNulls(s, d), "test", "documents")
        .orderBy(col("ordinal"))
    },

    // A4 standalone: negative-value detector over numeric columns.
    "a4_negative_values" -> { (s, d) =>
      customer(s, d).agg(
        count(when(col("c_custkey").cast("double") < 0, 1)).as("neg_custkey"),
        count(when(col("c_acctbal").cast("double") < 0, 1)).as("neg_acctbal"),
        count(when(col("c_nationkey").cast("double") < 0, 1)).as("neg_nationkey"))
    },

    // A5: deterministic 5-smallest-distinct sample via the bounded
    // single-pass aggregator.
    "a5_distinct_sample" -> { (s, d) =>
      orders(s, d).agg(
        array_join(SmallestKDistinct(col("o_orderpriority"), 5), ",").as("priority_sample"),
        array_join(SmallestKDistinct(col("o_orderstatus"), 5), ",").as("status_sample"))
    },

    // A6: schema introspection surfaced as rows (metadata op).
    "a6_schema_introspect" -> { (s, d) =>
      val fields = documents(s, d).schema.fields.zipWithIndex.map { case (f, i) =>
        (f.name, f.dataType.simpleString, i + 1)
      }
      s.createDataFrame(fields.toSeq).toDF("column_name", "data_type", "ordinal")
        .orderBy(col("ordinal"))
    },

    // A7: nested JSON report assembly (deterministic manual concat).
    "a7_quality_report" -> { (s, d) =>
      Profiler.qualityReport(nationDirty(s, d), "test", "nation")
    }
  )

  private val docsNullSql =
    """docs AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0 THEN NULL ELSE text END AS text,
      |    CASE WHEN doc_id % 20 = 0 THEN NULL ELSE lang END AS lang,
      |    source, n_chars
      |  FROM documents)""".stripMargin

  /** Per-column profile row for the documents profile oracle. */
  private def profRow(colName: String, ordinal: Int, dataType: String,
                      numeric: Boolean): String = {
    val neg = if (numeric) s"(SELECT count(*) FROM docs WHERE CAST($colName AS DOUBLE) < 0)"
              else "0"
    s"""SELECT 'test' AS schema, 'documents' AS table_name,
       | '$colName' AS column_name, $ordinal AS ordinal, '$dataType' AS data_type,
       | (SELECT count(*) FROM docs) AS n_rows, 5 AS n_cols,
       | (SELECT count($colName) FROM docs) AS not_null_count,
       | CAST((SELECT count($colName) FROM docs) AS DOUBLE) * 100 / (SELECT count(*) FROM docs) AS percentage_completeness,
       | CASE WHEN CAST((SELECT count($colName) FROM docs) AS DOUBLE) * 100 / (SELECT count(*) FROM docs) > 90
       |      THEN 'Good' ELSE 'Bad' END AS completeness_grade,
       | CAST($neg AS BIGINT) AS negative_count,
       | CAST($neg AS BIGINT) > 0 AS is_negative_values,
       | (SELECT coalesce(string_agg(v, ',' ORDER BY v), '') FROM
       |   (SELECT DISTINCT CAST($colName AS VARCHAR) AS v FROM docs
       |    WHERE $colName IS NOT NULL ORDER BY v LIMIT 5) t) AS sample_data""".stripMargin
  }

  private val nationDirtySql =
    """nat AS (
      |  SELECT n_nationkey,
      |    CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_name END AS n_name,
      |    CASE WHEN n_nationkey % 7 = 0 THEN -n_regionkey - 1 ELSE n_regionkey END AS n_regionkey
      |  FROM nation)""".stripMargin

  /** JSON fragments for the a7 oracle, per column of `nat`. */
  private def a7Col(colName: String, dataType: String, numeric: Boolean): (String, String) = {
    val neg = if (numeric) s"(SELECT count(*) FROM nat WHERE CAST($colName AS DOUBLE) < 0) > 0"
              else "false"
    val pct = s"CAST(CAST(round(CAST(count($colName) AS DOUBLE) * 100 / count(*), 2) AS DECIMAL(6,2)) AS VARCHAR)"
    val sample =
      s"""(SELECT coalesce(to_json(list(v ORDER BY v)), '[]') FROM
         |  (SELECT DISTINCT CAST($colName AS VARCHAR) AS v FROM nat
         |   WHERE $colName IS NOT NULL ORDER BY v LIMIT 5) t)""".stripMargin
    val profile =
      s"""'"$colName":{"data_type":"$dataType","sample_data":' || $sample || '}'"""
    val quality =
      s"""'"$colName":{"percentage_completeness":' || (SELECT $pct FROM nat) ||
         | ',"data_quality_completeness_result":"' ||
         | (SELECT CASE WHEN CAST(count($colName) AS DOUBLE) * 100 / count(*) > 90 THEN 'Good' ELSE 'Bad' END FROM nat) ||
         | '","is_negative_values":' || CAST($neg AS VARCHAR) || '}'""".stripMargin
    (profile, quality)
  }

  val oracle: Map[String, String] = {
    val cols = Seq(("n_nationkey", "int", true), ("n_name", "string", false),
                   ("n_regionkey", "int", true))
    val frags = cols.map { case (n, t, num) => a7Col(n, t, num) }
    val profileJson = frags.map(_._1).mkString(" || ',' || ")
    val qualityJson = frags.map(_._2).mkString(" || ',' || ")
    Map(
      "a1_table_counts" ->
        """SELECT * FROM (
          |  SELECT 'region' AS table_name, count(*) AS n_rows FROM region UNION ALL
          |  SELECT 'nation', count(*) FROM nation UNION ALL
          |  SELECT 'customer', count(*) FROM customer UNION ALL
          |  SELECT 'orders', count(*) FROM orders UNION ALL
          |  SELECT 'lineitem', count(*) FROM lineitem) ORDER BY table_name""".stripMargin,
      "a2_profile_documents" ->
        (s"WITH $docsNullSql\n" +
          Seq(
            profRow("doc_id", 1, "bigint", numeric = true),
            profRow("text", 2, "string", numeric = false),
            profRow("lang", 3, "string", numeric = false),
            profRow("source", 4, "string", numeric = false),
            profRow("n_chars", 5, "bigint", numeric = true)
          ).mkString("", "\nUNION ALL\n", "\nORDER BY ordinal")),
      "a4_negative_values" ->
        """SELECT count(*) FILTER (WHERE CAST(c_custkey AS DOUBLE) < 0) AS neg_custkey,
          |  count(*) FILTER (WHERE CAST(c_acctbal AS DOUBLE) < 0) AS neg_acctbal,
          |  count(*) FILTER (WHERE CAST(c_nationkey AS DOUBLE) < 0) AS neg_nationkey
          |FROM customer""".stripMargin,
      "a5_distinct_sample" ->
        """SELECT
          |  (SELECT string_agg(v, ',' ORDER BY v) FROM
          |    (SELECT DISTINCT o_orderpriority AS v FROM orders ORDER BY v LIMIT 5) a) AS priority_sample,
          |  (SELECT string_agg(v, ',' ORDER BY v) FROM
          |    (SELECT DISTINCT o_orderstatus AS v FROM orders ORDER BY v LIMIT 5) b) AS status_sample""".stripMargin,
      "a6_schema_introspect" ->
        """SELECT * FROM (VALUES
          |  ('doc_id', 'bigint', 1), ('text', 'string', 2), ('lang', 'string', 3),
          |  ('source', 'string', 4), ('n_chars', 'bigint', 5))
          |  AS t(column_name, data_type, ordinal) ORDER BY ordinal""".stripMargin,
      "a7_quality_report" ->
        s"""WITH $nationDirtySql
           |SELECT 'test' AS schema, 'nation' AS table_name,
           |  (SELECT count(*) FROM nat) AS n_rows, 3 AS n_cols,
           |  '{' || $profileJson || '}' AS data_profile,
           |  '{' || $qualityJson || '}' AS data_quality""".stripMargin
    )
  }
}
