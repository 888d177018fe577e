package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.SmallestKDistinct

/** Data-profiling module — the engine's native replacement for the
  * reference's PL/pgSQL `data_profile_quality()` table function
  * (`dags/data_profiling/query/data_profiling_function.sql:2-133`), which
  * loops tables × columns issuing one SQL statement per metric inside
  * Postgres. Here each table is profiled in a SINGLE Spark pass: one wide
  * aggregate computes, per column, the non-null count, the negative count
  * (numeric columns only), and a bounded 5-smallest-distinct sample
  * (see [[graft.functions.SmallestKDistinct]]); the per-column rows are
  * then exploded from the one aggregate row. No shuffle beyond the final
  * single-row aggregation — this is the shape that survives 100 TB.
  *
  * Semantics preserved from the reference:
  *  - completeness = not_null / rows * 100 (0 when the table is empty)
  *  - grade: completeness > 90 → 'Good' else 'Bad'
  *    (data_profiling_function.sql:82-101)
  *  - negative detection only for numeric types (:89-95)
  *  - sample: 5 distinct non-null values as text (:57-69) — made
  *    deterministic as the 5 smallest.
  */
object Profiler {

  private val NumericTypes: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)

  private def isNumeric(dt: DataType): Boolean =
    NumericTypes.contains(dt) || dt.isInstanceOf[DecimalType]

  /** One row per column of `df`:
    * (schema, table_name, column_name, data_type, n_rows, n_cols,
    *  not_null_count, percentage_completeness, completeness_grade,
    *  negative_count, is_negative_values, sample_data). */
  def profile(df: DataFrame, schemaName: String, tableName: String): DataFrame =
    profileFull(df, schemaName, tableName).drop("sample_arr")

  /** As [[profile]] plus the raw `sample_arr` array column (used by
    * [[qualityReport]] for correctly-escaped JSON — the comma-joined
    * `sample_data` string is ambiguous when values contain commas). */
  private[graft] def profileFull(df: DataFrame, schemaName: String, tableName: String): DataFrame = {
    val fields = df.schema.fields
    val nCols = fields.length

    val aggs: Seq[Column] =
      count(lit(1)).as("__rows") +: fields.flatMap { f =>
        val c = col(f.name)
        Seq(
          count(c).as(s"nn_${f.name}"),
          (if (isNumeric(f.dataType))
             count(when(c.cast("double") < 0, 1))
           else lit(0L)).as(s"neg_${f.name}"),
          SmallestKDistinct(c.cast("string"), 5).as(s"smp_${f.name}"))
      }.toSeq

    val one = df.agg(aggs.head, aggs.tail: _*)

    // Explode the single aggregate row into one row per column.
    val perCol = fields.zipWithIndex.map { case (f, i) =>
      struct(
        lit(f.name).as("column_name"),
        lit(i + 1).as("ordinal"),
        lit(f.dataType.simpleString).as("data_type"),
        col(s"nn_${f.name}").as("not_null_count"),
        col(s"neg_${f.name}").as("negative_count"),
        array_join(col(s"smp_${f.name}"), ",").as("sample_data"),
        col(s"smp_${f.name}").as("sample_arr"))
    }

    one
      .select(col("__rows").as("n_rows"), explode(array(perCol: _*)).as("c"))
      .select(
        lit(schemaName).as("schema"),
        lit(tableName).as("table_name"),
        col("c.column_name"),
        col("c.ordinal"),
        col("c.data_type"),
        col("n_rows"),
        lit(nCols).as("n_cols"),
        col("c.not_null_count"),
        when(col("n_rows") > 0,
          col("c.not_null_count").cast("double") * 100 / col("n_rows"))
          .otherwise(lit(0.0)).as("percentage_completeness"),
        when(col("n_rows") > 0 &&
          col("c.not_null_count").cast("double") * 100 / col("n_rows") > 90, "Good")
          .otherwise("Bad").as("completeness_grade"),
        col("c.negative_count"),
        (col("c.negative_count") > 0).as("is_negative_values"),
        col("c.sample_data"),
        col("c.sample_arr"))
  }

  /** A7: assemble the per-table JSON report documents exactly as the
    * reference's JSONB_BUILD_OBJECT nesting (:104-119), built with
    * deterministic manual concatenation (engine- and oracle-reproducible
    * byte-for-byte). One row per table: (schema, table_name, n_rows,
    * n_cols, data_profile, data_quality). */
  def qualityReport(df: DataFrame, schemaName: String, tableName: String): DataFrame = {
    val p = profileFull(df, schemaName, tableName)
    // to_json on the sample array: proper escaping for values containing
    // commas/quotes/backslashes (a comma re-split would corrupt them).
    val profileEntry = concat(
      lit("\""), col("column_name"), lit("\":{\"data_type\":\""),
      col("data_type"), lit("\",\"sample_data\":"),
      to_json(col("sample_arr")),
      lit("}"))
    val qualityEntry = concat(
      lit("\""), col("column_name"), lit("\":{\"percentage_completeness\":"),
      // fixed-scale decimal string so the text form is engine-independent
      round(col("percentage_completeness"), 2).cast("decimal(6,2)").cast("string"),
      lit(",\"data_quality_completeness_result\":\""), col("completeness_grade"),
      lit("\",\"is_negative_values\":"), col("is_negative_values").cast("string"),
      lit("}"))
    // collect_list gives no ordering guarantee after a shuffle — carry the
    // ordinal inside a struct, sort_array, then strip it.
    def joined(entry: Column): Column = concat(lit("{"),
      array_join(transform(
        sort_array(collect_list(struct(col("ordinal"), entry.as("e")))),
        x => x.getField("e")), ","), lit("}"))
    p.groupBy(col("schema"), col("table_name"), col("n_rows"), col("n_cols"))
      .agg(
        joined(profileEntry).as("data_profile"),
        joined(qualityEntry).as("data_quality"))
  }
}
