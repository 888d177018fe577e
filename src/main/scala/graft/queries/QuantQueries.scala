package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.Quant

/** Vector-compression gate over the embeddings table. The oracle
  * re-derives the ENTIRE quantizer in SQL — per-dimension float min/max
  * (selections, engine-independent), the affine int8 codes byte for
  * byte, and the exact-bits reconstruction error (all arithmetic in
  * double after exact float widening; one shared parenthesization, so
  * no rounding tolerance is needed anywhere). */
object QuantQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // int8 scalar quantization (FAISS SQ8 shape): corpus-trained
    // per-dimension ranges, full code roster + reconstruction error.
    "vq1_scalar_quant" -> { (s, d) =>
      Quant.scalarQuantize(embeddings(s, d), "vec_id", "embedding")
        .orderBy(col("vec_id"))
    }
  )

  val oracle: Map[String, String] = Map(
    "vq1_scalar_quant" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    generate_subscripts(embedding, 1) - 1 AS dim,
        |    unnest(embedding) AS v
        |  FROM embeddings),
        |mm AS (SELECT dim, min(v) AS lo, max(v) AS hi FROM e GROUP BY 1),
        |q AS (
        |  SELECT e.vec_id, e.dim,
        |    CAST(e.v AS DOUBLE) AS vd,
        |    CAST(mm.lo AS DOUBLE) AS lod,
        |    CAST(mm.hi AS DOUBLE) - CAST(mm.lo AS DOUBLE) AS span,
        |    CASE WHEN CAST(mm.hi AS DOUBLE) - CAST(mm.lo AS DOUBLE) > 0
        |      THEN CAST(round((CAST(e.v AS DOUBLE) - CAST(mm.lo AS DOUBLE))
        |        / (CAST(mm.hi AS DOUBLE) - CAST(mm.lo AS DOUBLE)) * 255.0) AS INT)
        |      ELSE 0 END AS code
        |  FROM e JOIN mm USING (dim))
        |SELECT vec_id, CAST(count(*) AS INT) AS n_dims,
        |  string_agg(CAST(code AS VARCHAR), ',' ORDER BY dim) AS codes,
        |  max(abs(vd - (lod + CAST(code AS DOUBLE) / 255.0 * span))) AS max_abs_err
        |FROM q GROUP BY vec_id ORDER BY vec_id""".stripMargin
  )
}
