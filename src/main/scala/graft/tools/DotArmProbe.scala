package graft.tools

import org.apache.spark.sql.functions._

/** r21: literal zip_with dot vs the graft_dot kernel on the candidate-
  * pair scoring shape (corpus x 8 queries, prenormed cosine). */
object DotArmProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity
    val emb = graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    val base = graft.core.Fanout.spread(emb, col("vec_id"))
      .withColumn("nv", Similarity.norm(col("v")))
      .localCheckpoint()
    val qs = base.limit(8).select(col("v").as("q"), col("nv").as("nq"))
    def pairs = base.crossJoin(broadcast(qs))
    def time(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val ts = (1 to 5).map(_ => once())
      println(f"[dotarm] $tag%-28s med=${ts.sorted.apply(2)}%6.3f s " +
        ts.map(t => f"$t%.3f").mkString("[", ",", "]"))
    }
    val litDot = aggregate(zip_with(col("q"), col("v"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    time("literal zip_with prenormed") {
      pairs.select(when(col("nq") * col("nv") > 0, litDot / (col("nq") * col("nv")))
        .otherwise(lit(0.0)).as("c"))
    }
    time("graft_dot prenormed") {
      pairs.select(Similarity.cosinePrenormed(col("q"), col("v"),
        col("nq"), col("nv")).as("c"))
    }
    spark.stop()
  }
}
