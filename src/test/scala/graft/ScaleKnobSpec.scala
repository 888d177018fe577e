package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Ivf, Similarity}

/** The LSH/centroid scale knobs (VERDICT r9 item 8): every
  * bucketed/clustered operator must grow its bucket or centroid count
  * with the corpus instead of letting per-bucket volume grow linearly
  * past the design point. These specs assert the knob MATH (expected
  * bucket/cluster size stays bounded across decades of n) and PIN the
  * values the sf0.01 oracles embed — if a knob default changes, the
  * pinned test fails before the hash gate does, pointing at the SQL
  * mirror that needs regenerating. */
class ScaleKnobSpec extends AnyFunSuite {

  test("planesFor: expected bucket size stays within [target/2, 2*target] across decades") {
    val target = 32
    // below the maxPlanes clamp even after the 10x step: 10n must stay
    // under 2^16 buckets * 2*target ≈ 4.2M (past it the scaladoc's
    // contract is explicit: scale by tables or shard the corpus)
    for (n <- Seq(100L, 1000L, 10000L, 100000L, 400000L)) {
      val p = Similarity.planesFor(n, target)
      val expectedBucket = n.toDouble / (1L << p)
      assert(expectedBucket <= 2.0 * target,
        s"n=$n planes=$p expectedBucket=$expectedBucket")
      // a 10x corpus must NOT mean a 10x bucket (the pre-fix y3 cliff):
      val p10 = Similarity.planesFor(10 * n, target)
      val bucket10 = 10.0 * n / (1L << p10)
      assert(bucket10 <= 2.0 * target,
        s"n=${10 * n} planes=$p10 expectedBucket=$bucket10")
    }
    // min clamp: tiny corpora keep at least 2^4 buckets
    assert(Similarity.planesFor(10, target) == 4)
    // max clamp: beyond 2^16 buckets, shard instead
    assert(Similarity.planesFor(100000000L, target) == 16)
  }

  test("centroidsFor: expected cluster size stays ~target across decades") {
    val target = 64
    // below the maxC clamp even after the 10x step (10n ≤ 65536 * 64)
    for (n <- Seq(2000L, 20000L, 200000L, 400000L)) {
      val c = Ivf.centroidsFor(n, target)
      val cluster = n.toDouble / c
      assert(cluster <= target + 1, s"n=$n c=$c cluster=$cluster")
      val c10 = Ivf.centroidsFor(10 * n, target)
      assert(10.0 * n / c10 <= target + 1, s"n=${10 * n} c10=$c10")
    }
    assert(Ivf.centroidsFor(100, 64) == 16, "min clamp")
    assert(Ivf.centroidsFor(100000000L, 64) == 65536, "max clamp")
  }

  test("Bench.stableMed: trims >3x outliers, keeps all-failed sentinel intact") {
    // a cold 6s first run must not decide the committed number
    assert(Bench.stableMed(Seq(6.0, 1.5, 1.6, 1.7)) == 1.6)
    // tight cluster: plain median
    assert(Bench.stableMed(Seq(1.0, 1.1, 1.2)) == 1.1)
    // every run failed -> -1 sentinel must survive (a negative floor
    // would empty the 3x filter and crash the report)
    assert(Bench.stableMed(Seq(-1.0)) == -1.0)
    // uniform slowness (a real regression) is NOT trimmed
    assert(Bench.stableMed(Seq(9.0, 9.5, 10.0)) == 9.5)
    // a single anomalously FAST run must not become the headline: the
    // stable cluster must hold a majority, else plain median wins
    assert(Bench.stableMed(Seq(0.5, 1.9, 1.9, 2.0)) == 1.9)
  }

  test("Bench.postCheckDecision: deviation vs committed ref downgrades to suspect") {
    def ref(total: Double, gate: String, lb: String, sf: String = "/d/sf0.1") =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sf",""" +
        s""""env":{"load_before":$lb,"quiet_gate":"$gate"}}"""
    val clean = Some(ref(120.0, "passed", "[0.5,0.8,1.0]"))
    // >15% slower than a clean committed ref -> suspect
    val (v1, n1) = Bench.postCheckDecision("passed", 151.0, "/d/sf0.1", clean, 2.0, 15.0)
    assert(v1 == "suspect" && n1.contains("deviation=+25.8%"), s"$v1 $n1")
    // within 15% -> stamp survives
    assert(Bench.postCheckDecision("passed", 130.0, "/d/sf0.1", clean, 2.0, 15.0)._1 == "passed")
    // FASTER is never suspect (one-sided)
    assert(Bench.postCheckDecision("passed", 90.0, "/d/sf0.1", clean, 2.0, 15.0)._1 == "passed")
    // a contaminated committed ref (the r18 151s artifact: 5-min load 10.11)
    // must NOT be a laundering baseline -> no_ref, stamp survives
    val dirty = Some(ref(151.0, "passed", "[2.18,10.11,13.75]"))
    val (v2, n2) = Bench.postCheckDecision("passed", 170.0, "/d/sf0.1", dirty, 2.0, 15.0)
    assert(v2 == "passed" && n2.startsWith("no_ref(ref_contended"), s"$v2 $n2")
    // ref at a different sf -> no comparison
    assert(Bench.postCheckDecision("passed", 170.0, "/d/sf1", clean, 2.0, 15.0)
      ._2.startsWith("no_ref(sf_mismatch"))
    // a timeout stamp is never upgraded by a good deviation
    assert(Bench.postCheckDecision("timeout", 121.0, "/d/sf0.1", clean, 2.0, 15.0)._1 == "timeout")
    // no ref at all (fresh clone / git unavailable)
    assert(Bench.postCheckDecision("passed", 121.0, "/d/sf0.1", None, 2.0, 15.0)
      ._2 == "no_ref(unreadable)")
  }

  test("oracle-coupling pins: the sf0.01 knob values the SQL mirrors embed") {
    // y3: 500 embeddings -> 4 planes (SimilarityQueries y3 oracle)
    assert(Similarity.planesFor(500, targetBucket = 32) == 4)
    // y2: 500 embeddings -> 4 planes (y2 oracle's sqlSignature(v, 4, t))
    assert(Similarity.planesFor(500, targetBucket = 32) == 4)
    // x5: 1000 doubled vectors -> 5 planes (x5 oracle's sqlSignature(v, 5))
    assert(Similarity.planesFor(1000, targetBucket = 32) == 5)
    // sd1: 1000 doubled vectors -> 16 centroids (sd1 oracle's LIMIT 16)
    assert(Ivf.centroidsFor(2L * 500) == 16)
  }
}
