package graft

import org.apache.spark.sql.functions._
import graft.operators.Lm
import graft.functions.TextAnalysis

/** LM data-prep specs: hand-computed unigram probabilities, vocab and
  * BPE-pair ranking determinism, blocked-postings layout, and the
  * Gopher-rule boundary cases. */
class LmSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry date")).toDF("doc_id", "text")

  test("unigramLogProb matches hand computation (add-one smoothing)") {
    // cf: apple 2, banana 2, cherry 4, date 1; T=9, V=4 -> p = (cf+1)/13
    def p(cf: Double) = (cf + 1) / 13.0
    val got = Lm.unigramLogProb(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val nll1 = -(2 * math.log(p(2)) + 1 * math.log(p(2))) / 3.0
    val nll3 = -(3 * math.log(p(4)) + 1 * math.log(p(1))) / 4.0
    assert(got(1L)._1 == 3 && math.abs(got(1L)._2 - nll1) < 1e-6)
    assert(got(3L)._1 == 4 && math.abs(got(3L)._2 - nll3) < 1e-6)
    // doc 3 is dominated by the most frequent term -> lowest surprise
    assert(got(3L)._2 < got(1L)._2 && got(3L)._2 < got(2L)._2)
  }

  test("unigramLogProb drops token-less docs, keeps single-token docs") {
    val got = Lm.unigramLogProb(
      corpus.unionByName(Seq((4L, "  "), (5L, "apple")).toDF("doc_id", "text")),
      "doc_id", "text").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L, 5L))
  }

  test("bigramLogProb matches hand computation; short docs absent") {
    // corpus: d1 "a b a", d2 "b a", d3 "solo" (no transitions)
    // c(a,b)=1 c(b,a)=2; c(prev=a)=1 c(prev=b)=2; V = FULL unigram
    // vocabulary |{a,b,solo}| = 3 (standard add-one bigram — "solo"
    // counts even though it never appears in a transition)
    // p(b|a) = (1+1)/(1+3) = 1/2, p(a|b) = (2+1)/(2+3) = 3/5
    val df = Seq((1L, "a b a"), (2L, "b a"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = Lm.bigramLogProb(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val nll1 = -(math.log(1.0 / 2.0) + math.log(3.0 / 5.0)) / 2.0
    val nll2 = -math.log(3.0 / 5.0)
    assert(got(1L)._1 == 2 && math.abs(got(1L)._2 - nll1) < 1e-6)
    assert(got(2L)._1 == 1 && math.abs(got(2L)._2 - nll2) < 1e-6)
    assert(!got.contains(3L), "a 1-token doc has no transitions")
  }

  test("vocabTopK ranks by cf desc then term asc, with doc frequency") {
    val rows = Lm.vocabTopK(corpus, "doc_id", "text", k = 3)
      .orderBy($"rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // cherry cf=4 df=2; apple/banana tie at cf=2 -> alphabetical
    assert(rows.toSeq == Seq((1, "cherry", 4L, 2L), (2, "apple", 2L, 1L),
      (3, "banana", 2L, 2L)))
  }

  test("bpePairCounts counts adjacent pairs; short docs contribute none") {
    val df = corpus.unionByName(Seq((4L, "solo"), (5L, " ")).toDF("doc_id", "text"))
    val got = Lm.bpePairCounts(df, "doc_id", "text", k = 10)
      .collect().map(r => r.getString(1) -> (r.getInt(0), r.getLong(2))).toMap
    // doc3 "cherry cherry cherry date": cherry|cherry x2, cherry|date x1
    assert(got("cherry cherry") == ((1, 2L)))
    assert(got("apple banana")._2 == 1L && got("banana apple")._2 == 1L)
    assert(got.size == 5, s"1-token and blank docs must add no pairs: $got")
  }

  test("applyMerge is greedy left-to-right, non-overlapping, null-safe at ends") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, Seq("a", "a", "a")),          // odd run: merge first pair only
      (2L, Seq("a", "a", "a", "a")),     // even run: two merges
      (3L, Seq("b", "a", "a", "b")),     // interior run
      (4L, Seq("a", "b", "a", "a")),     // candidate at the very end
      (5L, Seq("a")),                    // no pair possible
      (6L, Seq.empty[String]))           // empty doc stays empty
      .toDF("id", "toks")
    val got = df.select(col("id"),
        Lm.applyMerge(col("toks"), "a", "a", "~").as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("a~a", "a"))
    assert(got(2L) == Seq("a~a", "a~a"))
    assert(got(3L) == Seq("b", "a~a", "b"))
    assert(got(4L) == Seq("a", "b", "a~a"))
    assert(got(5L) == Seq("a"))
    assert(got(6L) == Seq())
  }

  test("bpeMerges iterates: later rounds count previously merged symbols") {
    // corpus engineered so round 2's winner EXISTS ONLY after round 1's
    // merge is applied: "x y" wins round 1 (3 occurrences); round 2's
    // top pair is then "x~y z" (2 occurrences) — unobservable by a
    // one-shot pair ranking over the raw corpus
    val df = Seq(
      (1L, "x y z q x y z q"),
      (2L, "x y w")).toDF("doc_id", "text")
    val got = Lm.bpeMerges(df, "doc_id", "text", rounds = 2)
      .orderBy($"round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got(0) == ((1, "x y", 3L)), got.toSeq)
    assert(got(1) == ((2, "x~y z", 2L)), got.toSeq)
  }

  test("bpeMerges at rounds=12 == driver-side reference trainer (delta-count path)") {
    // the delta-maintained counts must stay EXACTLY equal to a full
    // recount at every round — pin 12 rounds (well past the gate's 3,
    // so the maintained frame carries through many merge generations)
    // against an independent full-recount trainer over a seeded random
    // corpus from a 4-symbol alphabet (maximal pair churn: most merges
    // destroy and create pairs adjacent to earlier winners)
    def refMerge(toks: List[String], a: String, b: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer[String]()
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
          out += s"$a~$b"; i += 2
        } else { out += toks(i); i += 1 }
      }
      out.toList
    }
    def refTrain(docs: Seq[List[String]], rounds: Int): Seq[(Int, String, Long)] = {
      var cur = docs
      val picks = scala.collection.mutable.ArrayBuffer[(Int, String, Long)]()
      var r = 1; var done = false
      while (r <= rounds && !done) {
        val counts = cur.flatMap(t => t.iterator.zip(t.iterator.drop(1))
            .map { case (a, b) => s"$a $b" }.toList)
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        if (counts.isEmpty) done = true
        else {
          val (p, n) = counts.toSeq.minBy { case (pair, k) => (-k, pair) }
          picks += ((r, p, n))
          val Array(a, b) = p.split(" ", 2)
          cur = cur.map(refMerge(_, a, b))
        }
        r += 1
      }
      picks.toSeq
    }
    val rnd = new scala.util.Random(13)
    val docs = (1 to 120).map(_ =>
      List.fill(1 + rnd.nextInt(30))(Seq("a", "b", "c", "d")(rnd.nextInt(4))))
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = Lm.bpeMerges(df, "doc_id", "text", rounds = 12)
      .orderBy($"round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == refTrain(docs, 12), s"diverged: $got")
  }

  test("bpeMergesSampled(sample covers corpus) == distributed arm, round for round") {
    // the sampled arm's whole pipeline (hash-ordered sample, local
    // delta counts, lazy-deletion heap, greedy rewrite) must be
    // indistinguishable from the exact distributed trainer whenever the
    // sample is the whole corpus — the dispatch-correctness contract
    // (r14 verdict #1), pinned on the same churn-heavy seeded corpus as
    // the delta-count test
    val rnd = new scala.util.Random(29)
    val docs = (1 to 150).map(_ =>
      List.fill(1 + rnd.nextInt(30))(Seq("a", "b", "c", "d")(rnd.nextInt(4))))
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) }
      .toDF("doc_id", "text")
    val dist = Lm.bpeMergesDistributed(df, "doc_id", "text", 12, "~", (_, _, _) => ())
      .orderBy($"round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val samp = Lm.bpeMergesSampled(df, "doc_id", "text", rounds = 12,
        sampleDocs = 10000)
      .orderBy($"round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(samp == dist, s"sampled arm diverged:\n$samp\nvs\n$dist")
    // arm choice is the caller's EXPLICIT flag (r15 advice: no silent
    // semantics switch on a round-count heuristic): sampled = true
    // opts in and still matches; the default stays on the exact arm
    // even past the advisory warning threshold (rounds exhaust long
    // before 65 on this corpus, so both runs are cheap)
    val optIn = Lm.bpeMerges(df, "doc_id", "text",
        rounds = Lm.DistributedTrainMaxRounds + 1, sampled = true)
      .orderBy($"round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val distLong = Lm.bpeMerges(df, "doc_id", "text",
        rounds = Lm.DistributedTrainMaxRounds + 1)
      .orderBy($"round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(optIn == distLong, "opt-in sampled arm diverged at high rounds")
  }

  test("trainLocal tie-breaks pairs in UTF8 binary order, not UTF-16") {
    // U+10000 (UTF-16: surrogate pair starting D800; UTF-8: F0 90 80 80)
    // vs U+FFFD (UTF-16: FFFD; UTF-8: EF BF BD): String.compareTo puts
    // the supplementary char FIRST (D800 < FFFD), Spark's UTF8String
    // binary order the OTHER way — with equal counts the two arms must
    // still pick the same winner, so the local heap must compare UTF-8
    // bytes (Lm.scala comparator contract)
    val hi = new String(Character.toChars(0x10000))
    val lo = "�"
    val df = Seq((1L, s"q $hi"), (2L, s"q $lo")).toDF("doc_id", "text")
    assert(s"q $hi".compareTo(s"q $lo") < 0, "UTF-16 premise broke")
    val dist = Lm.bpeMergesDistributed(df, "doc_id", "text", 1, "~", (_, _, _) => ())
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val samp = Lm.bpeMergesSampled(df, "doc_id", "text", rounds = 1,
        sampleDocs = 100)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(dist == Seq((1, s"q $lo", 1L)), s"distributed picked $dist")
    assert(samp == dist, s"local tie-break diverged: $samp vs $dist")
  }

  test("bpeMergesSampled partial sample: deterministic and bounded") {
    val docs = (0L until 40L).map(i => (i, s"tok$i x y tok$i x y"))
    val df = docs.toDF("doc_id", "text")
    def run() = Lm.bpeMergesSampled(df, "doc_id", "text", rounds = 3,
        sampleDocs = 10)
      .orderBy($"round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val first = run()
    assert(first == run(), "partial sample must be reproducible")
    // "x y" appears twice in every doc: a 10-doc sample must count
    // exactly 20 — the n column reports SAMPLE counts by contract
    assert(first.head._2 == "x y" && first.head._3 == 20L, first)
  }

  test("bpeMerges stops when the corpus runs out of pairs") {
    val df = Seq((1L, "a a")).toDF("doc_id", "text")
    val got = Lm.bpeMerges(df, "doc_id", "text", rounds = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, "a a", 1L)))
  }

  test("bpeMerges leaves no persisted state behind") {
    // both state frames (corpus, counts) unpersist their predecessors
    // per round AND the final pair at exit — 12 rounds of training must
    // not grow the session's persistent-RDD set (the round-12 shape
    // leaked one corpus checkpoint per round)
    val rnd = new scala.util.Random(7)
    val df = (1 to 60).map(i => (i.toLong,
      List.fill(20)(Seq("a", "b", "c")(rnd.nextInt(3))).mkString(" ")))
      .toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Lm.bpeMerges(df, "doc_id", "text", rounds = 12).collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persistent RDD ids: $leaked")
  }

  test("bpeEncode applies the merge table in order; counts and text agree") {
    val df = Seq(
      (1L, "x y z q x y z q"),   // both merges fire, twice
      (2L, "x y w"),             // only merge 1 fires
      (3L, "z"),                 // untouched
      (4L, " ")).toDF("doc_id", "text") // zero tokens
    val got = Lm.bpeEncode(df, "doc_id", "text",
        Seq(("x", "y"), ("x~y", "z")))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(got(1L) == ((8, 4, "x~y~z q x~y~z q")))
    assert(got(2L) == ((3, 2, "x~y w")))
    assert(got(3L) == ((1, 1, "z")))
    assert(got(4L) == ((0, 0, "")))
    // train-then-encode round-trip: the corpus encoded with its OWN
    // learned table has every learned pair merged away (no adjacent
    // (a,b) from the table survives in any encoded sequence)
    val merges = Lm.bpeMerges(df, "doc_id", "text", rounds = 2)
      .orderBy($"round").collect()
      .map { r => val Array(a, b) = r.getString(1).split(" ", 2); (a, b) }
    val enc = Lm.bpeEncode(df, "doc_id", "text", merges.toSeq)
      .collect().map(_.getString(3))
    merges.foreach { case (a, b) =>
      assert(!enc.exists(_.contains(s"$a $b")),
        s"learned pair ($a,$b) survived encoding: ${enc.toSeq}") }
  }

  test("bpeEncode kernel arm == literal regexp arm, char for char") {
    // Same corpus, same table, both arms driven through Spark: the
    // literal chain via the public dispatch (table <= threshold), the
    // kernel expression invoked directly. Tokens include regex
    // metacharacters so Pattern.quote parity is exercised, and the
    // table includes a self-pair (a,a) and a composed pair built from
    // an earlier merge's output.
    val rnd = new scala.util.Random(42)
    val alpha = Seq("a", "b", "c", "d", "a.b", "c+")
    val docs = (1L to 40L).map(i => (i,
      List.fill(rnd.nextInt(31))(alpha(rnd.nextInt(alpha.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val merges = Seq(("a", "b"), ("a", "a"), ("a~b", "c"), ("a.b", "c+")) ++
      (1 to 116).map(_ => (alpha(rnd.nextInt(alpha.size)),
        alpha(rnd.nextInt(alpha.size))))
    assert(merges.size <= Lm.LiteralEncodeMaxMerges) // literal arm below
    val literal = Lm.bpeEncode(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val kernel = docs.select($"doc_id",
        graft.expressions.BpeEncode.column(spark,
          TextAnalysis.tokens($"text"), merges, "~").as("enc"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kernel == literal)
  }

  test("bpeEncode kernel arm == independent regex reference at 300 merges") {
    // Above the dispatch threshold the public API routes to the kernel;
    // pin it against a plain-JVM sequential regexp-pass reference (the
    // defining semantics) on a table size the literal Column arm is
    // never asked to hold.
    import java.util.regex.{Matcher, Pattern}
    def ref(text: String, merges: Seq[(String, String)]): String = {
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      var s = " " + toks.mkString(" ") + " "
      merges.foreach { case (a, b) =>
        s = Pattern.compile(
          "(?<= )" + Pattern.quote(a) + " " + Pattern.quote(b) + "(?= )")
          .matcher(s).replaceAll(Matcher.quoteReplacement(a + "~" + b))
      }
      s.trim
    }
    val rnd = new scala.util.Random(7)
    val alpha = Seq("a", "b", "c", "d", "e")
    val texts = (1L to 30L).map(i => (i,
      List.fill(rnd.nextInt(41))(alpha(rnd.nextInt(alpha.size))).mkString(" ")))
    // compose later merges from earlier outputs so deep tables exercise
    // merged-token matching, not just base pairs
    var grown = alpha
    val merges = (1 to 300).map { _ =>
      val p = (grown(rnd.nextInt(grown.size)), alpha(rnd.nextInt(alpha.size)))
      grown = grown :+ (p._1 + "~" + p._2)
      p
    }
    assert(merges.size > Lm.LiteralEncodeMaxMerges) // kernel arm via dispatch
    val got = Lm.bpeEncode(texts.toDF("doc_id", "text"), "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) == ref(t, merges), s"doc $id: '${t.take(60)}'")
    }
  }

  test("bpeEncode above the threshold plans O(1) nodes and no shuffle") {
    withAtScaleScans {
      // parquet-backed (a local Seq collapses to LocalTableScan by
      // constant folding, which would hide the projection's shape)
      val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      val merges = (1 to 200).map(i => (s"t$i", s"u$i"))
      val df = Lm.bpeEncode(docs, "doc_id", "text", merges)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("graft_bpe_encode"), plan)
      assert(!plan.contains("regexp_replace"), plan)
    }
  }

  test("invertedIndex blocks postings by doc-id range and sorts them") {
    val df = Seq((0L, "x"), (99L, "x"), (100L, "x y"), (250L, "x"))
      .toDF("doc_id", "text")
    val got = Lm.invertedIndex(df, "doc_id", "text", blockSize = 100L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got(("x", 0L)) == ((2L, 2L, "0,99")))
    assert(got(("x", 1L)) == ((1L, 1L, "100")))
    assert(got(("x", 2L)) == ((1L, 1L, "250")))
    assert(got(("y", 1L)) == ((1L, 1L, "100")))
    assert(got.size == 4)
  }

  test("mergeIndexes == full rebuild, incl. straddled-block postings") {
    val all = Seq((0L, "x"), (99L, "x"), (100L, "x y"), (150L, "x"), (250L, "x"))
      .toDF("doc_id", "text")
    // split INSIDE block 1 (100-199): base gets 100, delta gets 150
    val base = Lm.invertedIndex(all.filter($"doc_id" < 150), "doc_id", "text", 100L)
    val delta = Lm.invertedIndex(all.filter($"doc_id" >= 150), "doc_id", "text", 100L)
    val merged = Lm.mergeIndexes(base, delta)
      .orderBy($"term", $"block").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val rebuilt = Lm.invertedIndex(all, "doc_id", "text", 100L)
      .orderBy($"term", $"block").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(merged.toSeq == rebuilt.toSeq)
    assert(merged.exists(t => t._1 == "x" && t._2 == 1L && t._5 == "100,150"),
      "straddled block must re-sort the concatenated postings")
  }

  test("mergeIndexes fails loudly on overlapping doc-id sets") {
    val docs = Seq((1L, "x"), (2L, "x")).toDF("doc_id", "text")
    val idx = Lm.invertedIndex(docs, "doc_id", "text", 100L)
    val e = intercept[Exception] {
      Lm.mergeIndexes(idx, idx).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("overlapping doc ids")), e.toString)
  }

  test("gopher helpers: meanTokenLen exact division, distinct stopwords") {
    val rows = Seq((1L, "aa bbbb"), (2L, "the the the a"), (3L, "  "))
      .toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.meanTokenLen($"text").as("m"),
        TextAnalysis.distinctStopwordCount($"text").as("s"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2))).toMap
    assert(rows(1L) == ((3.0, 0)))
    // "the" repeated counts once; "a" counts once -> 2 distinct stopwords
    assert(rows(2L)._2 == 2)
    assert(rows(2L)._1 == 10.0 / 4)
    assert(rows(3L) == ((0.0, 0)))
  }

  test("unigramLogProb tokenizes once (shared tf behind a checkpoint)") {
    val df = Lm.unigramLogProb(Tables.documents(spark, "/root/testdata/sf0.001"),
      "doc_id", "text")
    // the checkpointed tf shows up as a scan of an ExistingRDD — the
    // explode/tokenize pipeline must not appear in the optimized plan
    // more than once
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("generate explode"),
      s"tokenize must happen once, behind the checkpoint:\n$plan")
  }

  test("vocab/pair top-k plan as TakeOrdered, not a global vocab window") {
    val v = Lm.vocabTopK(Tables.documents(spark, "/root/testdata/sf0.001"),
      "doc_id", "text", k = 10)
    assert(v.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val p = Lm.bpePairCounts(Tables.documents(spark, "/root/testdata/sf0.001"),
      "doc_id", "text", k = 10)
    assert(p.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }
}
