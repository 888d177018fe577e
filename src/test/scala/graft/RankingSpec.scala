package graft

import org.apache.spark.sql.functions._
import graft.operators.Ranking

/** TF-IDF / BM25 specs: hand-computed scores on a tiny corpus, ranking
  * determinism, and the no-global-window top-k plan shape. */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry date")).toDF("doc_id", "text")

  test("termFreqs counts per (doc, term) and drops empty docs") {
    val tf = Ranking.termFreqs(corpus.unionByName(
      Seq((4L, "   ")).toDF("doc_id", "text")), "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    assert(tf((1L, "apple")) == 2 && tf((1L, "banana")) == 1)
    assert(tf((3L, "cherry")) == 3 && tf((3L, "date")) == 1)
    assert(!tf.keys.exists(_._1 == 4L), "whitespace-only doc has no terms")
  }

  test("tfidf matches hand computation") {
    // N=3; apple: df=1, idf=ln(4/2)+1; banana: df=2, idf=ln(4/3)+1
    val rows = Ranking.tfidfTopTerms(corpus, "doc_id", "text", k = 5)
      .collect().map(r => ((r.getLong(0), r.getString(2)),
        (r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val (tfA, dfA, scoreA) = rows((1L, "apple"))
    assert(tfA == 2 && dfA == 1)
    assert(math.abs(scoreA - 2 * (math.log(4.0 / 2.0) + 1)) < 1e-6)
    val (_, dfB, scoreB) = rows((1L, "banana"))
    assert(dfB == 2)
    assert(math.abs(scoreB - (math.log(4.0 / 3.0) + 1)) < 1e-6)
    // rank 1 for doc 1 is the higher score (apple)
    assert(scoreA > scoreB)
  }

  test("tfidf rank orders by rounded score then term") {
    val r1 = Ranking.tfidfTopTerms(corpus, "doc_id", "text", k = 5)
      .filter($"doc_id" === 1L).orderBy($"rank")
      .collect().map(_.getString(2)).toSeq
    assert(r1 == Seq("apple", "banana"))
  }

  test("bm25 hand computation on a single matched term") {
    // query {cherry}: docs 2,3 match. N=3 docs with tokens, dls 3,2,4 ->
    // avgdl=3. idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)
    val got = Ranking.bm25TopDocs(corpus, "doc_id", "text", Seq("cherry"), k = 10)
      .collect().map(r => (r.getLong(1), (r.getInt(0), r.getDouble(2)))).toMap
    val idf = math.log(1 + 1.5 / 2.5)
    def c(tf: Double, dl: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))
    assert(math.abs(got(3L)._2 - c(3, 4)) < 1e-6)
    assert(math.abs(got(2L)._2 - c(1, 2)) < 1e-6)
    assert(got(3L)._1 == 1 && got(2L)._1 == 2, "tf-3 doc must outrank tf-1 doc")
    assert(!got.contains(1L), "doc without the term must not score")
  }

  test("bm25 top-k plans as TakeOrdered, not a global window over all docs") {
    val df = Ranking.bm25TopDocs(graft.Tables.documents(spark, "/root/testdata/sf0.001"),
      "doc_id", "text", Seq("data", "join"), k = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected per-partition top-k + k-row merge:\n$plan")
  }
}
