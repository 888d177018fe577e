package graft

import org.apache.spark.sql.functions._
import graft.expressions.CosineSimilarity
import graft.operators.Similarity

/** The native codegen expression must be bit-identical to the
  * zip_with/aggregate composition, SQL-callable, and null-safe. */
class CosineExprSpec extends SparkSpec {
  import spark.implicits._

  test("bit-identical to the Column composition on real embeddings") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", Similarity.toDouble($"embedding").as("v"))
    // the reference side is the PURE zip_with/aggregate composition
    // (Similarity.cosine itself routes through the dot kernel since r21,
    // so it can no longer serve as the independent reference)
    def pureCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val d = sqrt(Similarity.dot(a, a)) * sqrt(Similarity.dot(b, b))
      when(d > 0, Similarity.dot(a, b) / d).otherwise(lit(0.0))
    }
    val withBoth = emb.crossJoin(emb.limit(5).select($"v".as("q")))
      .select(
        pureCosine($"q", $"v").as("composed"),
        CosineSimilarity.column(spark, $"q", $"v").as("native"),
        Similarity.cosine($"q", $"v").as("routed"))
    val diff = withBoth.filter($"composed" =!= $"native" ||
      $"composed" =!= $"routed").count()
    assert(diff == 0, s"$diff rows differ between composed/native/routed cosine")
  }

  test("graft_dot kernel bit-identical to the zip_with/aggregate dot") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select($"vec_id", Similarity.toDouble($"embedding").as("v"))
    val withBoth = emb.crossJoin(emb.limit(5).select($"v".as("q")))
      .select(
        Similarity.dot($"q", $"v").as("composed"),
        Similarity.dotNative($"q", $"v").as("native"))
    val diff = withBoth.filter($"composed" =!= $"native").count()
    assert(diff == 0, s"$diff rows differ between composed and native dot")
  }

  test("SQL-callable after registration") {
    CosineSimilarity.register(spark)
    val r = spark.sql("SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-15)
  }

  test("null and zero-vector handling") {
    val df = Seq(
      (Some(Seq(0.0, 0.0)), Some(Seq(1.0, 2.0))),
      (None, Some(Seq(1.0, 2.0)))
    ).toDF("a", "b")
    val got = df.select(CosineSimilarity.column(spark, $"a", $"b").as("c")).collect()
    assert(got(0).getDouble(0) == 0.0) // zero vector -> 0, not NaN
    assert(got(1).isNullAt(0))         // null input -> null
  }
}
