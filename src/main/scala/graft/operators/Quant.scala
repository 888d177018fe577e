package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector compression for embedding pipelines: int8 scalar quantization
  * (the FAISS `SQ8` shape) — per-dimension affine [min, max] ranges
  * trained on the corpus itself, each float packed into one byte. At
  * 100 TB of embeddings this is the 4× storage/bandwidth cut applied
  * BEFORE anything expensive (ANN index builds, semantic dedup) touches
  * the vectors; [[Pq]] is the heavier codebook alternative.
  *
  * Scale shape: training is one posexplode → per-dimension min/max
  * aggregate (map-side combinable, d ≪ n rows out); the trained ranges
  * are contract-bounded (d entries — the IVF-seed pattern), so they ride
  * into the encode projection as literal arrays inside ONE codegen'd
  * per-row expression. The corpus is scanned once for training and once
  * for encoding; the encode pass itself is shuffle-free.
  *
  * Float parity (DuckDB oracle): min/max are selections (no arithmetic)
  * over float32, identical in any engine; all affine arithmetic is done
  * in DOUBLE after exact float→double widening, with one explicit
  * parenthesization mirrored in the SQL — codes and reconstruction
  * errors are then bit-identical, no rounding tolerance needed. */
object Quant {

  /** Train per-dimension [lo, hi] over `vecCol` (array<float>) and emit
    * per-row int8 codes plus the reconstruction error:
    * (id, n_dims, codes, max_abs_err) with
    *   code_i = round((v_i - lo_i) / (hi_i - lo_i) * 255)   (0 if hi = lo)
    *   err    = max_i |v_i - (lo_i + code_i/255 * (hi_i - lo_i))|
    * codes joined as a comma string (the oracle re-derives every byte). */
  def scalarQuantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // training pass: d rows out, d contract-bounded (embedding width)
    val ranges = df
      .select(posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col("dim"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      .collect().map(r => (r.getInt(0), r.getFloat(1), r.getFloat(2)))
      .sortBy(_._1)
    require(ranges.nonEmpty, "scalarQuantize: no vectors to train on")
    val los = array(ranges.map(t => lit(t._2.toDouble)): _*)
    val his = array(ranges.map(t => lit(t._3.toDouble)): _*)

    def lo(i: Column): Column = element_at(los, i + 1)
    def span(i: Column): Column = element_at(his, i + 1) - element_at(los, i + 1)
    def code(v: Column, i: Column): Column =
      when(span(i) > 0.0,
        round((v.cast("double") - lo(i)) / span(i) * 255.0).cast("int"))
        .otherwise(lit(0))
    def dequant(v: Column, i: Column): Column =
      lo(i) + code(v, i).cast("double") / 255.0 * span(i)

    // vector-less rows (null/empty embedding) carry nothing to encode
    // and are dropped — mirrors the oracle's unnest semantics, which
    // yields no rows for them
    df.filter(size(col(vecCol)) > 0).select(
      col(idCol),
      size(col(vecCol)).as("n_dims"),
      array_join(transform(col(vecCol), (v, i) => code(v, i).cast("string")), ",")
        .as("codes"),
      array_max(transform(col(vecCol),
        (v, i) => abs(v.cast("double") - dequant(v, i)))).as("max_abs_err"))
  }
}
