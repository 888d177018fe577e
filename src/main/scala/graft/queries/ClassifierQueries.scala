package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.Classifier

/** Learned-classifier coverage: multinomial NB trained on a labeled
  * seed split, scoring the full corpus (the CCNet/fastText curation
  * step). The seed is the even-doc_id half of `documents` labeled by
  * its `lang` column; the gate pins every document's per-class score
  * (6 dp) AND the argmax prediction, so a wrong count, prior, smoothing
  * denominator, or tie-break all hash-fail. `nb2` re-scores from a
  * parquet model store written and read back INSIDE the gate against
  * the SAME oracle — pinning store-roundtrip ≡ retrain (the x12/y7
  * store convention). */
object ClassifierQueries {

  private val Langs = Seq("de", "en", "es", "fr", "zh")

  /** Hash-lottery seed for the nb3 resampling gate (aux `b_resample`). */
  val ResampleSeed = 3001L
  private val ResampleTau = 0.02
  private val ResampleTemp = 0.02

  private def seedDocs(s: SparkSession, d: String): DataFrame =
    documents(s, d).filter(col("doc_id") % 2 === 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nb1_nb_classifier" -> { (s, d) =>
      Classifier.nbScore(documents(s, d), seedDocs(s, d),
        "doc_id", "text", "lang", Langs)
        .orderBy(col("doc_id"))
    },

    "nb2_nb_from_store" -> { (s, d) =>
      val dir = StoreDirs.fresh("nb_store", d)
      Classifier.nbTermStats(seedDocs(s, d), "text", "lang", Langs)
        .write.mode("overwrite").parquet(s"$dir/stats")
      Classifier.nbPriors(seedDocs(s, d), "lang", Langs)
        .write.mode("overwrite").parquet(s"$dir/priors")
      Classifier.nbScoreFromStats(documents(s, d),
        s.read.parquet(s"$dir/stats"), s.read.parquet(s"$dir/priors"),
        "doc_id", "text", Langs)
        .orderBy(col("doc_id"))
    },

    // DSIR/GPT-3-style data selection: keep by hash lottery against
    // exp((per-token en-vs-rest margin - tau) / T). Pins every kept
    // doc's margin, keep probability, and the lottery decision itself.
    "nb3_importance_resample" -> { (s, d) =>
      val scored = Classifier.nbScore(documents(s, d), seedDocs(s, d),
        "doc_id", "text", "lang", Langs)
      Classifier.importanceResample(scored, "en", Langs, ResampleSeed,
        tau = ResampleTau, temperature = ResampleTemp)
        .select(col("doc_id"), col("n_scored"), col("margin"),
          col("p_keep"), col("predicted"))
        .orderBy(col("doc_id"))
    },

    // classifier-in-the-loop curation: NB score -> importance resample
    // -> exact dedup of the survivors -> per-predicted-class stats.
    // Text for the dedup stage is joined BACK by doc_id rather than
    // carried through scoring (the roster exchange stays C+1 numbers
    // per doc; re-attaching text is one doc-keyed join against the
    // original scan — the x10 pattern).
    "cur4_curation_classifier" -> { (s, d) =>
      val scored = Classifier.nbScore(documents(s, d), seedDocs(s, d),
        "doc_id", "text", "lang", Langs)
      val kept = Classifier.importanceResample(scored, "en", Langs,
        ResampleSeed, tau = ResampleTau, temperature = ResampleTemp)
      val withText = kept.select(col("doc_id"), col("n_scored"), col("predicted"))
        .join(documents(s, d).select(col("doc_id"), col("text")), "doc_id")
      withText.groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"),
          min_by(col("predicted"), col("doc_id")).as("predicted"),
          min_by(col("n_scored"), col("doc_id")).as("n_scored"))
        .groupBy(col("predicted"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_scored")).as("total_tokens"),
          min(col("keep_id")).as("min_keep_id"))
        .orderBy(col("predicted"))
    }
  )

  /** The full NB derivation in SQL: seed token counts pivoted wide by
    * class, 1-row totals/priors, per-doc ln-sums, rounded scores, and
    * the same alphabetical-tie-break argmax CASE chain. Split into the
    * CTE chain + the argmax CASE so nb3 can extend the derivation. */
  private val (nbCtes, predCase) = {
    val toks = TextQueries.toksSql
    val cntCols = Langs.map(c =>
      s"sum(CASE WHEN lang = '$c' THEN 1 ELSE 0 END) AS cnt_$c").mkString(", ")
    val totCols = Langs.map(c => s"sum(cnt_$c) AS t_$c").mkString(", ")
    val ndCols = Langs.map(c =>
      s"sum(CASE WHEN lang = '$c' THEN 1 ELSE 0 END) AS nd_$c").mkString(", ")
    // per token INSTANCE, not tf·ln per distinct term: the engine sums
    // ln(cnt+α) once per instance, so the oracle must fold the SAME
    // multiset of doubles — only summation ORDER then differs between
    // engines (few-ulp class, absorbed by the 6-dp rounding like the
    // documented ln-ulp divergence; round-14 advice)
    val slCols = Langs.map(c =>
      s"sum(ln(cnt_$c + 1.0)) AS sl_$c").mkString(", ")
    val scoreCols = Langs.map(c =>
      s"round(ln(CAST(nd_$c AS DOUBLE) / n_seed) + sl_$c" +
        s" - n_scored * ln(t_$c + 1.0 * n_vocab), 6) AS score_$c").mkString(",\n|    ")
    val predCases = Langs.map { c =>
      val cond = Langs.filterNot(_ == c)
        .map(o => s"score_$c >= score_$o").mkString(" AND ")
      s"WHEN $cond THEN '$c'"
    }.mkString(" ")
    val ctes =
      s"""WITH seed AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
         |stok AS (
         |  SELECT lang, unnest(list_filter($toks, t -> len(t) > 0)) AS term
         |  FROM seed),
         |stats AS (SELECT term, $cntCols FROM stok GROUP BY 1),
         |totals AS (SELECT count(*) AS n_vocab, $totCols FROM stats),
         |priors AS (SELECT count(*) AS n_seed, $ndCols FROM seed),
         |ctok AS (
         |  SELECT doc_id, unnest(list_filter($toks, t -> len(t) > 0)) AS term
         |  FROM documents),
         |perdoc AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored, $slCols
         |  FROM ctok JOIN stats USING (term) GROUP BY doc_id),
         |scored AS (
         |  SELECT doc_id, n_scored,
         |    $scoreCols
         |  FROM perdoc, totals, priors)""".stripMargin
    (ctes, s"CASE $predCases ELSE '${Langs.min}' END")
  }

  private val nbSql =
    s"""$nbCtes
       |SELECT doc_id, n_scored, ${Langs.map(c => s"score_$c").mkString(", ")},
       |  $predCase AS predicted
       |FROM scored ORDER BY doc_id""".stripMargin

  /** nb1 extended by the length-normalized margin, exp keep probability
    * (rounded 6 dp BEFORE the lottery, the engine contract), and the aux
    * hash-bucket lottery — the shared CTE chain for nb3 and cur4. */
  private val keptCtes = {
    val otherMax = s"greatest(${Langs.filterNot(_ == "en")
      .map(c => s"score_$c").mkString(", ")})"
    s"""$nbCtes,
       |marg AS (
       |  SELECT doc_id, n_scored,
       |    (score_en - $otherMax) / n_scored AS m_raw,
       |    $predCase AS predicted
       |  FROM scored),
       |kept AS (
       |  SELECT m.doc_id, m.n_scored, round(m.m_raw, 6) AS margin,
       |    round(least(exp((m.m_raw - $ResampleTau) / $ResampleTemp), 1.0), 6) AS p_keep,
       |    m.predicted
       |  FROM marg m
       |  JOIN read_parquet('__AUX__/ds_doc_hash/*.parquet') a USING (doc_id)
       |  WHERE a.b_resample <
       |    round(least(exp((m.m_raw - $ResampleTau) / $ResampleTemp), 1.0), 6) * 1000000)""".stripMargin
  }

  private val nb3Sql =
    s"""$keptCtes
       |SELECT doc_id, n_scored, margin, p_keep, predicted
       |FROM kept ORDER BY doc_id""".stripMargin

  private val cur4Sql =
    s"""$keptCtes,
       |wtext AS (
       |  SELECT k.doc_id, k.n_scored, k.predicted, d.text
       |  FROM kept k JOIN documents d USING (doc_id)),
       |dedup AS (
       |  SELECT text, min(doc_id) AS keep_id,
       |    arg_min(predicted, doc_id) AS predicted,
       |    arg_min(n_scored, doc_id) AS n_scored
       |  FROM wtext GROUP BY text)
       |SELECT predicted, count(*) AS n_docs,
       |  CAST(sum(n_scored) AS BIGINT) AS total_tokens,
       |  min(keep_id) AS min_keep_id
       |FROM dedup GROUP BY predicted ORDER BY predicted""".stripMargin

  val oracle: Map[String, String] = Map(
    "nb1_nb_classifier" -> nbSql,
    // the store gate must equal a from-scratch retrain — same SQL.
    "nb2_nb_from_store" -> nbSql,
    "nb3_importance_resample" -> nb3Sql,
    "cur4_curation_classifier" -> cur4Sql
  )
}
