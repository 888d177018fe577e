package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Lm

/** Production-parameterization probe for BPE ENCODE (verdict r13 #1):
  * the literal arm folds one nested `regexp_replace` per merge into a
  * single projection — optimal at gate scale (3–50 merges), but a
  * production tokenizer applies 10k–50k merges. This probe measures,
  * per merge-table size, (a) the literal arm's plan-build + execution
  * cost and the parameterization where it BREAKS (analyzer/codegen
  * stack depth), and (b) the kernel-arm
  * ([[graft.expressions.BpeEncode]]) cost at vocabulary sizes far past
  * that cliff. The merge table is realistic: the corpus's own top
  * bigrams (training order = count order), so merges actually fire.
  *
  * Usage: runMain graft.tools.BpeScaleProbe [sfDir] [maxLiteral] [maxKernel]
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxLiteral = args.lift(1).map(_.toInt).getOrElse(4096)
    val maxKernel = args.lift(2).map(_.toInt).getOrElse(20000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))

    // merge table = top bigrams by count (ties broken by pair string,
    // same as bpePairCounts' ordering) — every prefix of it is a valid
    // training-order table over this corpus
    val bigrams = Lm.bpePairCounts(docs, "doc_id", "text", k = maxKernel)
      .orderBy(asc("rank"))
      .select("pair")
      .collect()
      .map { r => val Array(a, b) = r.getString(0).split(" ", 2); (a, b) }
      .toSeq
    // extend past the corpus's distinct-bigram count with COMPOSED
    // merges (output of an EARLIER merge paired with a vocab token) —
    // still a valid training-order table, and the realistic deep-table
    // shape: most merges cannot fire in most docs, which is exactly the
    // case the kernel's O(1) presence-skip exists for
    val toks = bigrams.flatMap(p => Seq(p._1, p._2)).distinct.toArray
    val full = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    full ++= bigrams
    var ci = 0
    while (full.size < maxKernel) {
      val (a, b) = full(ci)
      full += ((a + "~" + b, toks((ci * 7) % toks.length)))
      ci += 1
    }
    val table = full.toSeq
    println(s"[bpeprobe] sf=$sfDir corpus=${docs.count()} docs, " +
      s"distinct bigrams=${bigrams.size}, composed to ${table.size} merges")

    def run(label: String, n: Int,
            build: Seq[(String, String)] => org.apache.spark.sql.DataFrame): Unit = {
      val merges = table.take(n)
      if (merges.size < n) {
        println(s"[bpeprobe] $label n=$n SKIP (only ${merges.size} bigrams)")
        return
      }
      try {
        val t0 = System.nanoTime()
        val df = build(merges)
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t1 = System.nanoTime()
        val out = df.agg(sum(col("n_tokens_bpe")), sum(col("n_tokens_raw")))
          .collect()(0)
        val t2 = System.nanoTime()
        println(f"[bpeprobe] $label n=$n%5d plan=${(t1 - t0) / 1e9}%8.2fs " +
          f"exec=${(t2 - t1) / 1e9}%8.2fs bpe_tokens=${out.getLong(0)} " +
          f"raw_tokens=${out.getLong(1)}")
      } catch {
        case e: Throwable =>
          val root = {
            var c: Throwable = e
            while (c.getCause != null && c.getCause != c) c = c.getCause
            c
          }
          println(s"[bpeprobe] $label n=$n BREAK: " +
            s"${root.getClass.getSimpleName}: " +
            s"${Option(root.getMessage).getOrElse("").take(160)}")
      }
    }

    var n = 64
    while (n <= maxLiteral) {
      run("literal", n, m => Lm.bpeEncodeLiteral(docs, "doc_id", "text", m))
      run("kernel ", n, m => Lm.bpeEncodeKernel(docs, "doc_id", "text", m))
      n *= 2
    }
    n = 1024
    while (n <= maxKernel) {
      run("kernel ", n, m => Lm.bpeEncodeKernel(docs, "doc_id", "text", m))
      n *= 2
    }
    run("kernel ", maxKernel,
      m => Lm.bpeEncodeKernel(docs, "doc_id", "text", m))
    spark.stop()
  }
}
