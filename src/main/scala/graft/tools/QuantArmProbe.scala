package graft.tools

import org.apache.spark.sql.functions._

/** r21: time the literal-expression vs kernel arms of the PQ/IVF
  * quantizers at the GATE parameterizations (ks = 16, c = 16), where the
  * dispatch currently picks the literal arm. The r20 bench tail showed
  * y5/y6 broadcasting 1.2–1.7 MiB task binaries — the serialized
  * m×ks literal expression trees — so this probe decides whether the
  * kernel arm (codebooks as ONE literal, codegen'd loop) should own the
  * small-ks regime too. Noop sink per guide §1.4; median of 5.
  *
  *   runMain graft.tools.QuantArmProbe <sfDir>
  */
object QuantArmProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Ivf, Pq, Similarity}

    val emb = graft.Tables.embeddings(spark, d)
    val books = Pq.seedCodebooks(emb, "vec_id", "embedding", m = 8, ks = 16)
    val cents = Ivf.seedCentroids(emb, "vec_id", "embedding", 16, 7L)
    val v = Similarity.toDouble(col("embedding"))

    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[quantarm] $label%-28s med=${ts.sorted.apply(2)}%6.3f s " +
        ts.map(t => f"$t%.3f").mkString("[", ",", "]"))
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val spreadEmb = graft.core.Fanout.spread(emb, col("vec_id"))
      .filter(col("vec_id").isNotNull)
    time("pq codes literal") {
      noop(spreadEmb.select(col("vec_id"), Pq.codesColLiteral(v, books).as("c")))
    }
    time("pq codes kernel") {
      noop(spreadEmb.select(col("vec_id"), Pq.codesColKernel(v, books).as("c")))
    }
    time("ivf assign literal") {
      noop(spreadEmb.select(col("vec_id"),
        Ivf.nearestCidsLiteral(v, cents, 1).as("a")))
    }
    time("ivf assign kernel") {
      noop(spreadEmb.select(col("vec_id"),
        Ivf.nearestCidsKernel(v, cents, 1).as("a")))
    }
    spark.stop()
  }
}
