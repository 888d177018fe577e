package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextAnalysis
import graft.operators.Dedup

/** Auxiliary parquet tables for oracles of hash-based queries.
  *
  * xxhash64 has no DuckDB equivalent, so the raw Spark-computed token/
  * shingle hashes are dumped once per Verify run and the oracle SQL
  * reads them back with `read_parquet` — everything DOWNSTREAM of the
  * hash (minhash lanes, banding, bucket joins, vote sums, polynomial
  * folds, jaccard/hamming verification, thresholds, ranking) is then a
  * genuine cross-engine check in DuckDB. `Verify` writes each table to
  * the SIBLING directory `<outDir>_aux/<name>` — outside `outDir`
  * itself, because the driver treats every parquet under `outDir` as a
  * gated query result and would flag the aux dumps as phantom queries —
  * and substitutes [[Placeholder]] in the oracle SQL with that absolute
  * path at dump time.
  */
object OracleAux {

  /** Token replaced by the Verify-time aux directory in oracle SQL. */
  val Placeholder = "__AUX__"

  /** name -> (session, sfDir) -> aux DataFrame. */
  val tables: Map[String, (SparkSession, String) => DataFrame] = Map(
    // t3: per-token 32-bit hashes in document order (rolling fingerprint)
    "t3_token_h32" -> { (s, d) =>
      documents(s, d).select(col("doc_id"),
        posexplode(transform(TextAnalysis.tokens(col("text")),
          t => TextAnalysis.tokenHash32(t))).as(Seq("pos", "h")))
    },
    // x4: full 64-bit token hashes WITH multiplicity (simhash bit votes)
    "x4_token_h64" -> { (s, d) =>
      TextQueries.nearDupCorpus(s, d).select(col("doc_id"),
        explode(transform(TextAnalysis.tokens(col("text")),
          t => xxhash64(t))).as("h"))
    },
    // x3: 32-bit-domain shingle hashes (minhash lane input)
    "x3_gram_h32" -> { (s, d) =>
      TextQueries.nearDupCorpus(s, d).select(col("doc_id"),
        explode(transform(Dedup.shingles(col("text"), 3),
          g => TextAnalysis.tokenHash32(g))).as("h"))
    },
    // x3: 64-bit shingle hashes (jaccard verification sets)
    "x3_gram_h64" -> { (s, d) =>
      TextQueries.nearDupCorpus(s, d).select(col("doc_id"),
        explode(transform(Dedup.shingles(col("text"), 3),
          g => xxhash64(g))).as("g"))
    },
    // x7: positional k-gram hashes WITH positions (exact substring
    // spans) — duplicated-set, span merge, and aggregates recomputed
    // in SQL downstream.
    "x7_gram_pos" -> { (s, d) =>
      Dedup.positionalGramHashes(TextQueries.nearDupCorpus(s, d),
        "doc_id", "text", k = 8)
        .select(col("id").as("doc_id"), col("pos"), col("gh"))
    },
    // cur5: shingle hashes of the CLEANED corpus (the composed chain
    // dedups post-hygiene text, so its minhash mirror needs hashes of
    // exactly that text). Dumped for ALL docs — the oracle restricts to
    // its own derived post-resample survivor set, which is valid
    // because signatures are per-doc and corpus-independent.
    "cur5_gram_h32" -> { (s, d) =>
      documents(s, d)
        .select(col("doc_id"), TextAnalysis.cleanText(col("text")).as("text"))
        .select(col("doc_id"),
          explode(transform(Dedup.shingles(col("text"), 3),
            g => TextAnalysis.tokenHash32(g))).as("h"))
    },
    "cur5_gram_h64" -> { (s, d) =>
      documents(s, d)
        .select(col("doc_id"), TextAnalysis.cleanText(col("text")).as("text"))
        .select(col("doc_id"),
          explode(transform(Dedup.shingles(col("text"), 3),
            g => xxhash64(g))).as("g"))
    },
    // ds*: per-doc hash buckets for every sampling/shuffle seed the
    // dataset-curation queries use — the DECISIONS (thresholds, epoch
    // composition, permutation order) are recomputed in SQL on top.
    "ds_doc_hash" -> { (s, d) =>
      import graft.operators.Sampling.hashBucket
      documents(s, d).select(col("doc_id"),
        hashBucket(col("doc_id"), 1001L).as("b_sample"),
        hashBucket(col("doc_id"), 2000L).as("b_epoch0"),
        hashBucket(col("doc_id"), 2001L).as("b_epoch1"),
        hashBucket(col("doc_id"), DatasetQueries.TempSeed).as("b_temp"),
        hashBucket(col("doc_id"), DatasetQueries.SplitSeed).as("b_split"),
        xxhash64(col("doc_id"), lit(777L)).as("h_shuffle"),
        xxhash64(col("doc_id"), lit(DatasetQueries.QuotaSeed)).as("h_quota"),
        hashBucket(col("doc_id"), ClassifierQueries.ResampleSeed).as("b_resample"))
    }
  )
}
