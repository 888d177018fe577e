package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.{Packing, Sampling}

/** Training-dataset curation operators: deterministic sampling, weighted
  * mixing, epoch remixes, sequence packing, global shuffle. The sampling
  * decisions key off xxhash64 (no DuckDB equivalent), so the per-doc
  * hash buckets are dumped as an aux table ([[OracleAux]]) and every
  * POLICY — stratum thresholds, epoch seeds, packing arithmetic,
  * permutation ordering — is recomputed in SQL on top of them. */
object DatasetQueries {

  /** Seeds are part of the contract: same seed = same subset. */
  private val SampleSeed = 1001L
  private val EpochBase  = 2000L
  private val ShuffleSeed = 777L

  private val LangRates   = Map("en" -> 0.5, "de" -> 0.2)
  private val SourceRates = Map("src0" -> 1.0, "src1" -> 0.5)
  private[queries] val QuotaSeed = 3003L
  private[queries] val TempSeed = 4004L
  private val TempBudget = 200L
  private[queries] val SplitSeed = 5005L
  private[queries] val Splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // deterministic stratified sample: per-language rates, one scan,
    // membership independent of partitioning (pure filter — no shuffle).
    "ds1_stratified_sample" -> { (s, d) =>
      Sampling.stratifiedSample(documents(s, d), "doc_id", "lang",
        LangRates, defaultFraction = 0.1, seed = SampleSeed)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    },

    // weighted source mixing across 2 independently-seeded epochs.
    "ds2_epoch_mix" -> { (s, d) =>
      Sampling.epochMix(documents(s, d), "doc_id", "source",
        SourceRates, defaultFraction = 0.25, epochs = 2, baseSeed = EpochBase)
        .groupBy(col("epoch"), col("source"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("epoch"), col("source"))
    },

    // sequence packing: documents on a token tape in doc_id order,
    // chunked into 2048-token bins; offsets via the scale-safe
    // two-level running sum (no corpus-sized single-task window).
    "ds3_sequence_packing" -> { (s, d) =>
      val docs = documents(s, d).select(col("doc_id"),
        graft.functions.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      Packing.packSequences(docs, "n_tokens", "doc_id", budget = 2048L)
        .select(col("doc_id"), col("n_tokens"), col("start_offset"),
          col("bin_id"), col("bin_offset"))
        .orderBy(col("doc_id"))
    },

    // per-group quota cap: at most 40 docs per language, deterministic
    // seeded-hash order (domain capping for mixture balance).
    "ds5_quota_sample" -> { (s, d) =>
      Sampling.quotaSample(documents(s, d)
        .select(col("doc_id"), col("lang")), "doc_id", "lang",
        quota = 40, seed = QuotaSeed)
        .orderBy(col("doc_id"))
    },

    // temperature-balanced mixture (alpha=0.5, XLM-R style): rates
    // DERIVED from the corpus's own per-language counts, then applied
    // as the one-scan hash-threshold filter. The kept roster checks the
    // whole derivation (counts -> sqrt weights -> budget split -> rate
    // rounding -> membership) jointly.
    "ds6_temperature_mix" -> { (s, d) =>
      Sampling.temperatureSample(documents(s, d)
        .select(col("doc_id"), col("lang")), "doc_id", "lang",
        alpha = 0.5, budget = TempBudget, seed = TempSeed)
        .orderBy(col("doc_id"))
    },

    // deterministic 80/10/10 train/val/test split: the full labeled
    // roster is gated, so exclusivity, coverage, and every threshold
    // decision are hash-checked jointly.
    "ds7_hash_split" -> { (s, d) =>
      Sampling.hashSplit(documents(s, d).select(col("doc_id"), col("lang")),
        "doc_id", Splits, seed = SplitSeed)
        .orderBy(col("doc_id"))
    },

    // deterministic global shuffle: the full pseudo-random permutation,
    // positions assigned by the parallel ranged-rank construction.
    "ds4_doc_shuffle" -> { (s, d) =>
      Sampling.shuffledPositions(documents(s, d)
        .select(col("doc_id"), col("lang")), "doc_id", ShuffleSeed)
        .select(col("position"), col("doc_id"), col("lang"))
        .orderBy(col("position"))
    }
  )

  private val aux = "read_parquet('__AUX__/ds_doc_hash/*.parquet')"

  private def caseThreshold(strataCol: String, rates: Map[String, Double],
                            default: Double): String = {
    val whens = rates.toSeq.sortBy(_._1).map { case (k, f) =>
      s"WHEN '$k' THEN ${math.round(f * Sampling.Buckets)}"
    }.mkString(" ")
    s"CASE $strataCol $whens ELSE ${math.round(default * Sampling.Buckets)} END"
  }

  val oracle: Map[String, String] = Map(
    "ds1_stratified_sample" ->
      s"""SELECT d.doc_id, d.lang, d.source
         |FROM documents d JOIN $aux a USING (doc_id)
         |WHERE a.b_sample < ${caseThreshold("d.lang", LangRates, 0.1)}
         |ORDER BY d.doc_id""".stripMargin,

    "ds2_epoch_mix" ->
      s"""WITH picked AS (
         |  SELECT 0 AS epoch, d.source FROM documents d JOIN $aux a USING (doc_id)
         |  WHERE a.b_epoch0 < ${caseThreshold("d.source", SourceRates, 0.25)}
         |  UNION ALL
         |  SELECT 1 AS epoch, d.source FROM documents d JOIN $aux a USING (doc_id)
         |  WHERE a.b_epoch1 < ${caseThreshold("d.source", SourceRates, 0.25)})
         |SELECT CAST(epoch AS INT) AS epoch, source,
         |  CAST(count(*) AS BIGINT) AS n_docs
         |FROM picked GROUP BY epoch, source ORDER BY epoch, source""".stripMargin,

    "ds3_sequence_packing" -> {
      val toks = TextQueries.toksSql
      s"""WITH t AS (
         |  SELECT doc_id, CAST(len($toks) AS INT) AS n_tokens FROM documents),
         |c AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS start_offset
         |  FROM t)
         |SELECT doc_id, n_tokens, start_offset,
         |  CAST(start_offset // 2048 AS BIGINT) AS bin_id,
         |  CAST(start_offset % 2048 AS BIGINT) AS bin_offset
         |FROM c ORDER BY doc_id""".stripMargin
    },

    "ds4_doc_shuffle" ->
      s"""SELECT CAST(row_number() OVER (ORDER BY a.h_shuffle, d.doc_id) AS BIGINT)
         |    AS position,
         |  d.doc_id, d.lang
         |FROM documents d JOIN $aux a USING (doc_id)
         |ORDER BY position""".stripMargin,

    // ds6: the whole temperature derivation recomputed in SQL — counts,
    // sqrt weights folded in sorted-lang order (list_reduce mirrors the
    // engine's left-to-right deterministic sum; sqrt is IEEE-exact,
    // unlike pow), budget split, floor(x*1e6 + 0.5) threshold (the
    // math.round contract), then hash-bucket membership from the aux.
    "ds6_temperature_mix" ->
      s"""WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
         |tot AS (
         |  SELECT list_reduce(list(sqrt(CAST(n AS DOUBLE)) ORDER BY lang),
         |    (a, b) -> a + b) AS wsum FROM cnt),
         |thr AS (
         |  SELECT lang,
         |    CAST(floor(least(1.0, $TempBudget.0 * sqrt(CAST(n AS DOUBLE))
         |      / (wsum * CAST(n AS DOUBLE))) * ${Sampling.Buckets} + 0.5) AS BIGINT) AS t
         |  FROM cnt CROSS JOIN tot)
         |SELECT d.doc_id, d.lang
         |FROM documents d JOIN $aux a USING (doc_id) JOIN thr USING (lang)
         |WHERE a.b_temp < thr.t
         |ORDER BY d.doc_id""".stripMargin,

    // ds7: thresholds are cumulative math.round(frac * 1e6) mirrored as
    // literals (cum 0.8 -> 800000, 0.9 -> 900000); the last split is
    // the ELSE, matching the engine's exhaustive-by-construction CASE.
    "ds7_hash_split" ->
      s"""SELECT d.doc_id, d.lang,
         |  CASE WHEN a.b_split < 800000 THEN 'train'
         |       WHEN a.b_split < 900000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents d JOIN $aux a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    "ds5_quota_sample" ->
      s"""WITH ranked AS (
         |  SELECT d.doc_id, d.lang,
         |    row_number() OVER (PARTITION BY d.lang
         |      ORDER BY a.h_quota, d.doc_id) AS rn
         |  FROM documents d JOIN $aux a USING (doc_id))
         |SELECT doc_id, lang FROM ranked WHERE rn <= 40
         |ORDER BY doc_id""".stripMargin
  )
}
