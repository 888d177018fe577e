package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Ivf, Similarity}

/** SemDeDup-shape semantic dedup: the keep/drop contract is recomputed
  * independently driver-side, determinism is partitioning-independent,
  * and the within-cluster self-join reuses the assign exchange. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def twins = {
    val base = graft.Tables.embeddings(spark, sf).select($"vec_id",
      Similarity.toDouble($"embedding").as("embedding"))
    base.unionByName(base.select(($"vec_id" + 100000L).as("vec_id"),
      transform($"embedding", x => x + lit(0.01)).as("embedding")))
  }

  test("keep/drop matches an independent driver-side recompute") {
    val tau = 0.95
    val got = Dedup.semanticDedup(twins, "vec_id", "embedding", threshold = tau)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getBoolean(2)))).toMap
    // independent truth: cluster via the (separately spec'd) assign path,
    // then brute-force within-cluster pairs in plain Scala
    val rows = Ivf.assign(twins, "vec_id", "embedding",
      Ivf.seedCentroids(twins, "vec_id", "embedding", 16))
      .select("id", "v", "cluster_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getInt(2)))
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val (na, nb) = (math.sqrt(a.map(x => x * x).sum), math.sqrt(b.map(x => x * x).sum))
      if (na * nb > 0) a.zip(b).map { case (x, y) => x * y }.sum / (na * nb) else 0.0
    }
    val byCluster = rows.groupBy(_._3)
    val expected = rows.map { case (id, v, cl) =>
      val dropped = byCluster(cl).exists { case (id2, v2, _) =>
        id2 < id && cos(v2, v) >= tau
      }
      id -> ((cl, !dropped))
    }.toMap
    assert(got.size == rows.length, "roster must cover every id exactly once")
    val diff = expected.collect { case (id, e) if got(id) != e => (id, e, got(id)) }
    assert(diff.isEmpty, s"${diff.size} mismatches, first: ${diff.take(3)}")
    // the corpus was built to contain near-dups: some rows must drop,
    // and the smallest id of each neighborhood must survive
    assert(got.values.exists(!_._2), "twins corpus must produce drops")
    assert(got.values.exists(_._2), "representatives must survive")
  }

  test("result is independent of input partitioning") {
    val one = Dedup.semanticDedup(twins, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSet
    val other = Dedup.semanticDedup(twins.repartition(13), "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSet
    assert(one == other)
  }

  test("semanticDedup: identical-vector collapse is roster-identical and drops all non-reps") {
    val rnd = new scala.util.Random(7)
    def vec(): Seq[Double] = Seq.fill(32)(rnd.nextGaussian())
    val hotVec = vec()
    val nearBase = vec()
    // 200-copy identical mega cluster (ids 0..199) + a planted NEAR
    // (not identical) pair + 60 diverse fillers — the collapse must
    // leave every non-identical decision to the ordinary pair join
    val rows = Seq.tabulate(200)(i => (i.toLong, hotVec)) ++
      Seq(500L -> nearBase, 501L -> nearBase.map(_ * 1.000001)) ++
      Seq.tabulate(60)(i => ((1000 + i).toLong, vec()))
    val df = rows.toDF("vec_id", "embedding")
    def roster(collapse: Boolean): Map[Long, (Int, Boolean)] =
      Dedup.semanticDedup(df, "vec_id", "embedding", threshold = 0.9,
          c = 4, collapseIdentical = collapse)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    val coll = roster(collapse = true)
    val plain = roster(collapse = false)
    // the collapse is EXACTLY semantics-preserving — full-roster equality
    assert(coll == plain)
    // sanity on the mega cluster: 199 non-reps all dropped; and the
    // planted near pair kept its ordinary keep-min decision
    assert((1L to 199L).forall(i => !coll(i)._2))
    assert(coll(501L)._2 == false && coll(500L)._2 == plain(500L)._2)
    // threshold within 1e-9 of 1.0 auto-disables the collapse (float
    // round-off of cosine(v, v) could diverge there) — both arms must
    // still agree because they ARE the same path
    val collOne = Dedup.semanticDedup(df, "vec_id", "embedding",
        threshold = 1.0, c = 4, collapseIdentical = true)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val plainOne = Dedup.semanticDedup(df, "vec_id", "embedding",
        threshold = 1.0, c = 4, collapseIdentical = false)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(collOne == plainOne)
  }

  test("semanticDedup: identical ZERO-vector twins are exempt from the collapse") {
    // r15 advice: cosinePrenormed defines cosine = 0.0 when a norm is 0,
    // so the pair rule KEEPS identical zero twins (0.0 < threshold); the
    // collapse must not silently drop them. Mix zero twins with a normal
    // identical group to pin that the exemption is per-group, not global.
    val rnd = new scala.util.Random(11)
    def vec(): Seq[Double] = Seq.fill(16)(rnd.nextGaussian())
    val hot = vec()
    val zero = Seq.fill(16)(0.0)
    val rows = Seq.tabulate(5)(i => (i.toLong, zero)) ++
      Seq.tabulate(5)(i => ((100 + i).toLong, hot)) ++
      Seq.tabulate(20)(i => ((1000 + i).toLong, vec()))
    val df = rows.toDF("vec_id", "embedding")
    def roster(collapse: Boolean): Map[Long, Boolean] =
      Dedup.semanticDedup(df, "vec_id", "embedding", threshold = 0.9,
          c = 4, collapseIdentical = collapse)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val coll = roster(collapse = true)
    assert(coll == roster(collapse = false),
      "collapse must be roster-identical in the presence of zero vectors")
    // every zero twin survives (cosine 0.0 < 0.9)...
    assert((0L to 4L).forall(coll(_)), s"zero twins must all be kept: $coll")
    // ...while the normal identical group still collapses to its min id
    assert(coll(100L) && (101L to 104L).forall(!coll(_)))
  }

  test("embeddingCosinePairs: two-stage guard — refine splits dense cells, drop owns identical clusters") {
    val rnd = new scala.util.Random(42)
    def vec(): Seq[Double] = Seq.fill(64)(rnd.nextGaussian())
    val a = vec()                      // 100 IDENTICAL copies — stage-2 target
    val b = vec()                      // planted exact twin pair — must survive
    val fill = Seq.fill(80)(vec())     // diverse filler — hot cells at planes=2
    val rows = Seq.tabulate(100)(i => (i.toLong, a)) ++
      Seq(200L -> b, 201L -> b) ++
      fill.zipWithIndex.map { case (v, i) => ((300 + i).toLong, v) }
    val df = rows.toDF("vec_id", "embedding")
    // planes=2 -> 4 base buckets, so every bucket is "hot" at cap 16:
    // ALL rows take the refine path; 12 refine planes split the diverse
    // filler (pair collision 1/2^12) but CANNOT split identical vectors
    val guarded = Dedup.embeddingCosinePairs(df, "vec_id", "embedding",
      threshold = 0.95, planes = 2, maxBucketSize = 16, refinePlanes = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unguarded = Dedup.embeddingCosinePairs(df, "vec_id", "embedding",
      threshold = 0.95, planes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // stage 2: the 100-copy identical cluster's refined sub-group still
    // holds 100 > 16 -> dropped wholesale
    assert(unguarded.count { case (x, y) => x < 100 && y < 100 } == 100 * 99 / 2)
    assert(guarded.forall { case (x, y) => x >= 100 && y >= 100 })
    // stage 1 refinement keeps the planted twin pair: identical vectors
    // agree on every refine plane and their sub-group is tiny
    assert(guarded.contains((200L, 201L)))
    // refinement only ever REMOVES candidates (verify is unchanged)
    assert(guarded.subsetOf(unguarded))
    // and an unbounded guard is the identity
    val noop = Dedup.embeddingCosinePairs(df, "vec_id", "embedding",
      threshold = 0.95, planes = 2, maxBucketSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(noop == unguarded)
  }

  test("plan: sort-merge self-join over a reused assign exchange") {
    // ReuseExchange is visible only in the FINAL adaptive plan,
    // post-execution (same caveat as PlanSpec's dedup assertions)
    val df = Dedup.semanticDedup(twins, "vec_id", "embedding")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("SortMergeJoin"),
      s"within-cluster pairing must be a sort-merge join:\n$plan")
    assert("ReusedExchange".r.findAllIn(plan).nonEmpty,
      s"second self-join leg must reuse the assign exchange:\n$plan")
  }
}
