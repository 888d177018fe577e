package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pq, Similarity}

/** PQ/ADC specs: codebook shapes, encode determinism, twin recall,
  * reconstruction-distance sanity, and the compressed-scan plan shape. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def emb = graft.Tables.embeddings(spark, sf)

  test("seedCodebooks slices seeds into m codebooks of ks centroids") {
    val books = Pq.seedCodebooks(emb, "vec_id", "embedding", m = 8, ks = 16)
    assert(books.size == 8)
    assert(books.forall(_.size == 16))
    assert(books.forall(_.forall(_.size == 8)))
    // subspace s of seed c is literally the seed vector's s-th slice
    val seed0 = emb.filter($"vec_id" % 7 === 0).orderBy($"vec_id")
      .select(Similarity.toDouble($"embedding")).head().getSeq[Double](0)
    assert(books(3)(0) == seed0.slice(24, 32))
  }

  test("encode is deterministic and a seed vector reconstructs to itself") {
    val books = Pq.seedCodebooks(emb, "vec_id", "embedding", m = 8, ks = 16)
    val a = Pq.encode(emb, "vec_id", "embedding", books)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    val b = Pq.encode(emb.repartition(7), "vec_id", "embedding", books)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    assert(a == b, "codes must not depend on partitioning")
    // the first seed (smallest id % 7 == 0 -> vec_id 0) is centroid 0
    // of every subspace, so its own code vector is all zeros
    assert(a(0L) == Seq.fill(8)(0), s"seed 0 must encode to centroid 0: ${a(0L)}")
  }

  test("adcTopK ranks the identical twin first with adc 0") {
    val base = emb.select($"vec_id", Similarity.toDouble($"embedding").as("embedding"))
    val twin = emb.select(($"vec_id" + 100000L).as("vec_id"),
      Similarity.toDouble($"embedding").as("embedding"))
    val corpus = base.unionByName(twin)
    val qs = Seq(1L, 2L, 3L)
    val top1 = Pq.adcTopK(corpus, "vec_id", "embedding", qs, k = 1)
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getDouble(3)))).toMap
    qs.foreach { q =>
      val (nb, dist) = top1(q)
      assert(nb == q + 100000L, s"identical twin of $q shares every code")
      assert(dist == top1(q)._2 && dist >= 0.0)
    }
    // identical vectors have identical codes -> identical reconstruction
    // -> adc(q, twin) == adc(q, q's own codes) (the minimum possible)
  }

  test("adc recall vs brute force is reported") {
    val qs = Seq(0L, 1L, 2L, 3L, 4L)
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qs, 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Pq.adcTopK(emb, "vec_id", "embedding", qs, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    info(s"PQ recall@10 vs cosine brute force = ${(bf intersect pq).size.toDouble / bf.size}")
    assert(pq.size == bf.size)
  }

  test("plan: corpus never shuffles; only scored triples reach the window exchange") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.types.ArrayType
    val df = Pq.adcTopK(emb, "vec_id", "embedding", Seq(0L, 1L), k = 5)
    val root: SparkPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other => other
    }
    assert(root.collect { case e: BroadcastExchangeExec => e }.nonEmpty,
      "queries+luts must broadcast")
    val shuffles = root.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 1, s"only the top-k window exchange, got ${shuffles.size}")
    shuffles.foreach { e =>
      assert(!e.output.exists(_.dataType.isInstanceOf[ArrayType]),
        "neither vectors nor codes may shuffle: " +
          e.output.map(a => s"${a.name}:${a.dataType.simpleString}").mkString(", "))
    }
  }
}
