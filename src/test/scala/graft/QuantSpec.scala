package graft

import org.apache.spark.sql.functions._
import graft.operators.Quant

/** Scalar-quantization specs: hand-computed codes at range extremes and
  * midpoints, the degenerate constant dimension, reconstruction-error
  * bounds, and the shuffle-free encode plan. */
class QuantSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("codes: extremes hit 0/255, midpoint rounds half-up, constant dim -> 0") {
    val df = vecs(
      (1L, Seq(0.0f, 10.0f, 7.0f)),
      (2L, Seq(1.0f, 20.0f, 7.0f)),
      (3L, Seq(0.5f, 15.0f, 7.0f)))
    val got = Quant.scalarQuantize(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2), r.getDouble(3)))
      .toMap
    // dim0 range [0,1], dim1 [10,20], dim2 constant 7
    assert(got(1L)._2 == "0,0,0")
    assert(got(2L)._2 == "255,255,0")
    // 0.5/1*255 = 127.5 -> 128 (half-up); (15-10)/10*255 = 127.5 -> 128
    assert(got(3L)._2 == "128,128,0")
    assert(got(1L)._1 == 3)
    // extremes and constants reconstruct exactly
    assert(got(1L)._3 == 0.0 && got(2L)._3 == 0.0)
    // midpoint error: |0.5 - 128/255| (dim1 scales the same relative gap)
    val expected = math.abs(0.5 - 128.0 / 255.0) * 10.0
    assert(math.abs(got(3L)._3 - expected) < 1e-12)
  }

  test("vector-less rows are dropped (oracle unnest semantics)") {
    val df = Seq((1L, Seq(0.0f, 1.0f)), (2L, Seq.empty[Float]))
      .toDF("vec_id", "embedding")
    val got = Quant.scalarQuantize(df, "vec_id", "embedding")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L), "empty embedding must yield no output row")
  }

  test("reconstruction error bounded by half a quantization step") {
    val df = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = Quant.scalarQuantize(df, "vec_id", "embedding")
    // half-step bound per dim: span/510 (+ float->double slack); assert
    // against the worst dimension's span
    val spans = df.select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("dim").agg((max($"v") - min($"v")).as("span"))
      .agg(max($"span")).first().getFloat(0)
    val worst = q.agg(max($"max_abs_err")).first().getDouble(0)
    assert(worst <= spans / 510.0 + 1e-9,
      s"err $worst exceeds half-step ${spans / 510.0}")
    assert(q.count() == df.count())
  }

  test("encode pass is shuffle-free (ranges ride as literals)") {
    val df = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = Quant.scalarQuantize(df, "vec_id", "embedding")
    // training already ran at construction (driver collect); the encode
    // query itself must plan as scan -> project with no exchange
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
  }
}
