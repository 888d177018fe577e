package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.Bucketing

/** Scale-technique specs: salting correctness (same results as plain
  * shapes) and bucketed joins planning without exchanges. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAggregate == plain aggregate on skewed data") {
    // 90% of rows share one key — the shape AQE can't fix for aggregates
    val df = (1 to 1000).map(i => (if (i % 10 == 0) s"k$i" else "hot", i.toLong))
      .toDF("k", "v")
    val plain = df.groupBy($"k").agg(count(lit(1)).as("n_rows"), sum($"v").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAggregate(df, "k", Map("total" -> $"v"), saltSource = $"v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin == plain join") {
    val large = (1 to 500).map(i => (i % 5, i.toLong)).toDF("k", "v")
    val small = Seq((0, "a"), (1, "b"), (2, "c"), (3, "d"), (4, "e")).toDF("k", "name")
    val plain = large.join(small, Seq("k")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(large, small, Seq("k"), saltSource = $"v")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
  }

  test("bucketed join plans without a shuffle exchange") {
    // managed tables land in ./spark-warehouse (gitignored); the
    // warehouse dir is a static conf that can't move post-session.
    Seq("bkt_a", "bkt_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(s"spark-warehouse/$t")
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    val a = (1 to 200).map(i => (i.toLong, s"a$i")).toDF("k", "av")
    val b = (1 to 200).map(i => (i.toLong, s"b$i")).toDF("k", "bv")
    Bucketing.writeBucketed(a, "bkt_a", "k", buckets = 8)
    Bucketing.writeBucketed(b, "bkt_b", "k", buckets = 8)
    // force sort-merge (the tiny test tables would otherwise broadcast)
    // to show the bucket-aligned plan has NO shuffle exchange at all
    val joined = spark.table("bkt_a").hint("merge")
      .join(spark.table("bkt_b"), Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"),
      s"bucketed merge join must not repartition:\n$plan")
    assert(plan.contains("SortMergeJoin"))
    assert(joined.count() == 200)
    assert(Bucketing.bucketedJoin(spark, "bkt_a", "bkt_b", "k").count() == 200)
  }

  test("ngramJaccardPairs: adversarial shared-prefix block is banded, not quadratic") {
    import graft.operators.Dedup
    // 310 docs ALL sharing the block key (2-token prefix "the company" +
    // identical shingle count) — the skewed-hot-block shape that makes
    // uncapped prefix blocking quadratic. 5 planted one-token-edit twins
    // (jaccard ≈ 0.74) and 5 exact duplicates (jaccard 1.0).
    def doc(i: Int) = "the company " + (0 until 20).map(j => s"w${i}_$j").mkString(" ")
    val base  = (0 until 300).map(i => (i.toLong, doc(i)))
    val twins = (0 until 5).map(i =>
      (1000L + i, doc(i).split(" ").updated(12, "swapped").mkString(" ")))
    val dups  = (5 until 10).map(i => (2000L + i, doc(i)))
    val corpus = (base ++ twins ++ dups).toDF("id", "text")

    // candidate volume: threshold 0 surfaces every candidate pair the
    // join generated. Uncapped = all within-block pairs (~48k); capped =
    // only same-(band,bucket) collisions — orders of magnitude fewer.
    val uncapped = Dedup.ngramJaccardPairs(corpus, "id", "text", 3, 0.0,
      maxBlockSize = 1000000).count()
    val capped = Dedup.ngramJaccardPairs(corpus, "id", "text", 3, 0.0,
      maxBlockSize = 64).count()
    assert(uncapped > 40000L, s"adversarial corpus should be quadratic uncapped: $uncapped")
    assert(capped < uncapped / 20,
      s"capped block still near-quadratic: $capped vs $uncapped candidates")

    // recall on the banded path: exact dups always collide (identical
    // signatures); one-token-edit twins at the standard LSH probability
    // (deterministic here — fixed hash family).
    val found = Dedup.ngramJaccardPairs(corpus, "id", "text", 3, 0.6, maxBlockSize = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (5 until 10).foreach(i =>
      assert(found.contains((i.toLong, 2000L + i)), s"exact dup $i missed"))
    val twinHits = (0 until 5).count(i => found.contains((i.toLong, 1000L + i)))
    assert(twinHits >= 3, s"twin recall $twinHits/5 under banding")
  }

  test("ngramJaccardPairs: maxBucketSize drops identical mega-clusters inside hot blocks") {
    import graft.operators.Dedup
    // within-block banding cannot split IDENTICAL documents (they share
    // every minhash lane): a 100-copy cluster in a hot block puts its
    // whole membership in one bucket per band — the guard's target. The
    // planted exact-twin pair shares the block AND the identical-sig
    // property, but its bucket groups hold 2 — far under the cap.
    def doc(i: Int) = "the company " + (0 until 20).map(j => s"w${i}_$j").mkString(" ")
    val mega = (0 until 100).map(i => (i.toLong, doc(9999)))
    val pair = Seq((5000L, doc(7777)), (5001L, doc(7777)))
    val fill = (0 until 50).map(i => (6000L + i, doc(i)))
    // one block of 152 > maxBlockSize(64): everything takes the skew path
    val corpus = (mega ++ pair ++ fill).toDF("id", "text")
    val un = Dedup.ngramJaccardPairs(corpus, "id", "text", 3, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(un.count { case (a, b) => a < 100 && b < 100 } == 100 * 99 / 2)
    assert(un.contains((5000L, 5001L)))
    val g = Dedup.ngramJaccardPairs(corpus, "id", "text", 3, 0.6,
        maxBucketSize = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cluster dropped wholesale (owned by exact dedup); twins survive;
    // the guard only ever removes candidates
    assert(g.forall { case (a, b) => !(a < 100 || b < 100) }, g.take(5))
    assert(g.contains((5000L, 5001L)))
    assert(g.subsetOf(un))
  }
}
