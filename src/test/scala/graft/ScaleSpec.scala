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
}
