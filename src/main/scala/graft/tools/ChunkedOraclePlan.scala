package graft.tools

/** Chunked-DuckDB oracle plan for the disk-limited big-SF pins (verdict
  * r13 #5): at sf10 the monolithic x3-family oracle SQL spills past the
  * box's disk inside the band self-join, so x10/x11/v4 fell back to
  * independent-comparator pins. This generalizes the fix: shard the
  * quadratic middle (candidate generation + verification) by
  * `hash(bucket) % K`, materializing each linear stage and each chunk
  * to parquet, then run the final roster SQL over the unioned verified
  * pairs — peak DuckDB state drops to ~1/K of the monolith while the
  * RESULT is the oracle derivation, not a second engine implementation.
  *
  * Correctness of the shard: a candidate pair is discovered through
  * (band, bucket) collisions; sharding by bucket routes every collision
  * of a bucket to exactly one chunk, so the union of chunk outputs is
  * the full candidate set (a pair colliding in several buckets appears
  * in several chunks — the cross-chunk DISTINCT in the union step is
  * exactly the monolith's DISTINCT). Verification (jaccard from the
  * full gram sets) is per-pair and chunk-local.
  *
  * This main WRITES the plan (a JSON list of DuckDB statements +
  * the final comparison query) — `tools/chunked_oracle.py` executes it
  * (duckdb-python is oracle-side tooling, same as tools/check.py).
  * The hash family constants come from [[graft.operators.Dedup]]
  * directly, so the plan can never drift from the engine's parameters.
  *
  * Usage: runMain graft.tools.ChunkedOraclePlan <auxDir> <workDir> <K> <outJson>
  */
object ChunkedOraclePlan {

  def x11Plan(auxDir: String, work: String, chunks: Int): (Seq[String], String) = {
    val params = graft.operators.Dedup.hashParams(128)
    val prime = graft.operators.Dedup.MinhashPrime
    val lanes = params.zipWithIndex.map { case ((a, b), i) =>
      s"min((h * $a + $b) % $prime) AS m$i"
    }.mkString(", ")
    val bandsSql = (0 until 16).map { b =>
      val cols = (0 until 8).map(r => s"m${b * 8 + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, concat_ws(',', $cols) AS bucket FROM read_parquet('$work/sigs.parquet')"
    }.mkString(" UNION ALL ")
    val steps = Seq(
      // linear stages, one materialization each
      s"""COPY (WITH h32 AS (SELECT doc_id, h FROM read_parquet('$auxDir/x3_gram_h32/*.parquet'))
         |SELECT doc_id, $lanes FROM h32 GROUP BY doc_id)
         |TO '$work/sigs.parquet' (FORMAT PARQUET)""".stripMargin,
      s"""COPY ($bandsSql) TO '$work/banded.parquet' (FORMAT PARQUET)""",
      s"""COPY (SELECT DISTINCT doc_id, g FROM read_parquet('$auxDir/x3_gram_h64/*.parquet'))
         |TO '$work/g64.parquet' (FORMAT PARQUET)""".stripMargin,
      s"""COPY (SELECT doc_id, count(*) AS n FROM read_parquet('$work/g64.parquet') GROUP BY doc_id)
         |TO '$work/sizes.parquet' (FORMAT PARQUET)""".stripMargin) ++
      // the quadratic middle, sharded by bucket hash
      (0 until chunks).map { k =>
        // the r15 gate bucket guard, mirrored: ALL members of a (band,
        // bucket) land in one chunk (the shard key is hash(bucket)), so
        // the within-chunk count IS the global bucket size — a no-op on
        // uniform corpora (max dup family ~4), exact on zipf ones
        s"""COPY (
           |WITH banded0 AS (
           |  SELECT * FROM read_parquet('$work/banded.parquet')
           |  WHERE hash(bucket) % $chunks = $k),
           |banded AS (
           |  SELECT doc_id, band, bucket FROM (
           |    SELECT doc_id, band, bucket,
           |      count(*) OVER (PARTITION BY band, bucket) AS __bs
           |    FROM banded0) WHERE __bs <= ${graft.queries.TextQueries.MaxBucket}),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM banded a JOIN banded b
           |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
           |g64 AS (SELECT doc_id, g FROM read_parquet('$work/g64.parquet')),
           |sizes AS (SELECT doc_id, n FROM read_parquet('$work/sizes.parquet')),
           |inter AS (
           |  SELECT c.id_a, c.id_b, count(*) AS i
           |  FROM cand c
           |  JOIN g64 ga ON ga.doc_id = c.id_a
           |  JOIN g64 gb ON gb.doc_id = c.id_b AND gb.g = ga.g
           |  GROUP BY c.id_a, c.id_b)
           |SELECT i.id_a, i.id_b,
           |  CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) AS jaccard_sim
           |FROM inter i
           |JOIN sizes sa ON sa.doc_id = i.id_a
           |JOIN sizes sb ON sb.doc_id = i.id_b
           |WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= 0.6
           |) TO '$work/pairs_chunk_$k.parquet' (FORMAT PARQUET)""".stripMargin
      } ++ Seq(
      // cross-chunk DISTINCT == the monolith's DISTINCT
      s"""COPY (SELECT DISTINCT id_a, id_b, jaccard_sim
         |FROM read_parquet('$work/pairs_chunk_*.parquet'))
         |TO '$work/pairs.parquet' (FORMAT PARQUET)""".stripMargin)
    // the x11/x12 roster over the assembled pairs — byte-for-byte the
    // gate oracle's final SELECT, with `pairs` now a parquet scan
    val finalSql =
      s"""WITH pairs AS (SELECT * FROM read_parquet('$work/pairs.parquet')),
         |cross_pairs AS (
         |  SELECT id_a AS a_id, id_b AS b_id, jaccard_sim FROM pairs
         |  WHERE id_a IN (SELECT doc_id FROM documents)
         |    AND id_b IN (SELECT doc_id + 1000000 FROM documents)
         |  UNION ALL
         |  SELECT id_b AS a_id, id_a AS b_id, jaccard_sim FROM pairs
         |  WHERE id_b IN (SELECT doc_id FROM documents)
         |    AND id_a IN (SELECT doc_id + 1000000 FROM documents)),
         |roster AS (
         |  SELECT b_id AS doc_id, a_id, jaccard_sim,
         |    row_number() OVER (PARTITION BY b_id
         |      ORDER BY jaccard_sim DESC, a_id ASC) AS rn
         |  FROM cross_pairs)
         |SELECT doc_id, a_id AS matched_doc_id, jaccard_sim
         |FROM roster WHERE rn = 1 ORDER BY doc_id""".stripMargin
    (steps, finalSql)
  }

  /** Chunked x10 (cluster keep-best) oracle: the expensive middle is
    * the SAME sharded pair derivation as x11 — the recursive min-label
    * closure, per-doc quality, and keep-best window then run over the
    * materialized 1-in-a-million-of-the-volume pair list (dup clusters
    * are small by ScaleGen construction, so the closure's Σ|cluster|²
    * reach set stays linear). This was the last big-SF pin still on an
    * independent comparator (X10Pin). */
  def x10Plan(auxDir: String, work: String, chunks: Int): (Seq[String], String) = {
    val (steps, _) = x11Plan(auxDir, work, chunks)
    val toksSql = graft.queries.TextQueries.toksSql
    val qualitySql = graft.queries.TextQueries.qualitySql
    val finalSql =
      s"""WITH RECURSIVE pairs AS (SELECT * FROM read_parquet('$work/pairs.parquet')),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b AS src, id_a AS dst FROM pairs),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
         |clusters AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
         |corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id,
         |    array_to_string(list_slice($toksSql, 1, len($toksSql) - 1), ' ') || ' graftdup' AS text
         |  FROM documents),
         |quality AS (SELECT doc_id, $qualitySql AS q FROM corpus),
         |ranked AS (
         |  SELECT c.cluster_id, c.doc_id, q.q,
         |    row_number() OVER (PARTITION BY c.cluster_id
         |      ORDER BY q.q DESC, c.doc_id ASC) AS rn,
         |    count(*) OVER (PARTITION BY c.cluster_id) AS n_members
         |  FROM clusters c JOIN quality q USING (doc_id))
         |SELECT cluster_id, doc_id AS keep_id, q AS quality_score,
         |  CAST(n_members AS BIGINT) AS n_members
         |FROM ranked WHERE rn = 1 ORDER BY cluster_id""".stripMargin
    (steps, finalSql)
  }

  /** Chunked v4 (BPE encode) / v3 (BPE merges) oracle: training is
    * corpus-global but ADDITIVE (per-shard pair counts sum to the
    * corpus counts; the top-1 pick with its (n DESC, pair ASC)
    * tie-break runs over the summed counts), and the apply step is
    * per-doc — so each round materializes per-shard counts, one global
    * 1-row winner, and per-shard rewritten token lists. Peak DuckDB
    * state is one shard's token lists instead of the whole corpus's,
    * which is what OOM'd the monolithic SQL at sf1. The CTE chain per
    * round is the gate oracle's own (LmQueries.bpeSql) with `w$r` read
    * from the materialized winner. */
  def bpePlan(workDir: String, chunks: Int,
              query: String): (Seq[String], String) = {
    val toks = graft.queries.TextQueries.toksSql
    val rounds = graft.queries.LmQueries.BpeRounds
    val t0 = (0 until chunks).map { k =>
      s"""COPY (SELECT doc_id, list_filter($toks, x -> len(x) > 0) AS tk
         |FROM documents WHERE hash(doc_id) % $chunks = $k)
         |TO '$workDir/bpe_t0_$k.parquet' (FORMAT PARQUET)""".stripMargin
    }
    val roundSteps = (1 to rounds).flatMap { r =>
      val p = r - 1
      val cnt = (0 until chunks).map { k =>
        s"""COPY (SELECT pair, CAST(count(*) AS BIGINT) AS n FROM (
           |  SELECT unnest(list_transform(
           |    generate_series(1, greatest(len(tk) - 1, 0)),
           |    i -> tk[i] || ' ' || tk[i + 1])) AS pair
           |  FROM read_parquet('$workDir/bpe_t${p}_$k.parquet'))
           |GROUP BY pair)
           |TO '$workDir/bpe_cnt_${r}_$k.parquet' (FORMAT PARQUET)""".stripMargin
      }
      val pick =
        s"""COPY (SELECT pair, CAST(sum(n) AS BIGINT) AS n,
           |  split_part(pair, ' ', 1) AS a, split_part(pair, ' ', 2) AS b
           |FROM read_parquet('$workDir/bpe_cnt_${r}_*.parquet')
           |GROUP BY pair ORDER BY sum(n) DESC, pair ASC LIMIT 1)
           |TO '$workDir/bpe_w_$r.parquet' (FORMAT PARQUET)""".stripMargin
      val apply = (0 until chunks).map { k =>
        s"""COPY (
           |WITH w AS (SELECT * FROM read_parquet('$workDir/bpe_w_$r.parquet')),
           |u AS (
           |  SELECT doc_id, unnest(generate_series(1, len(tk))) AS pos, tk
           |  FROM read_parquet('$workDir/bpe_t${p}_$k.parquet')),
           |v AS (
           |  SELECT doc_id, pos, tk[pos] AS tok, tk[pos + 1] AS nxt FROM u),
           |c AS (
           |  SELECT doc_id, pos,
           |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS run
           |  FROM v
           |  WHERE tok = (SELECT a FROM w) AND nxt = (SELECT b FROM w)),
           |kk AS (
           |  SELECT doc_id, pos FROM (
           |    SELECT doc_id, pos,
           |      pos - min(pos) OVER (PARTITION BY doc_id, run) AS off
           |    FROM c)
           |  WHERE off % 2 = 0)
           |SELECT doc_id, list(newtok ORDER BY pos) AS tk FROM (
           |  SELECT v.doc_id, v.pos,
           |    CASE WHEN ks.pos IS NOT NULL
           |      THEN v.tok || '~' || v.nxt ELSE v.tok END AS newtok
           |  FROM v
           |  LEFT JOIN kk ks ON ks.doc_id = v.doc_id AND ks.pos = v.pos
           |  LEFT JOIN kk kd ON kd.doc_id = v.doc_id AND kd.pos = v.pos - 1
           |  WHERE kd.pos IS NULL)
           |GROUP BY doc_id)
           |TO '$workDir/bpe_t${r}_$k.parquet' (FORMAT PARQUET)""".stripMargin
      }
      cnt ++ Seq(pick) ++ apply
    }
    val finalSql = query match {
      case "v3" =>
        (1 to rounds).map(r =>
          s"SELECT CAST($r AS INT) AS round, pair, n FROM read_parquet('$workDir/bpe_w_$r.parquet')")
          .mkString("\nUNION ALL ") + "\nORDER BY round"
      case "v5" =>
        s"""WITH t0 AS (SELECT * FROM read_parquet('$workDir/bpe_t0_*.parquet')),
           |tR AS (SELECT * FROM read_parquet('$workDir/bpe_t${rounds}_*.parquet')),
           |enc AS (
           |  SELECT t0.doc_id,
           |    CAST(len(t0.tk) AS INT) AS n_tokens_raw,
           |    CAST(COALESCE(len(tR.tk), len(t0.tk)) AS INT) AS n_tokens_bpe
           |  FROM t0 LEFT JOIN tR USING (doc_id)),
           |j AS (
           |  SELECT e.doc_id, e.n_tokens_raw, e.n_tokens_bpe, d.lang
           |  FROM enc e JOIN documents d USING (doc_id))
           |SELECT lang, count(*) AS n_docs,
           |  CAST(sum(n_tokens_raw) AS BIGINT) AS raw_tokens,
           |  CAST(sum(n_tokens_bpe) AS BIGINT) AS bpe_tokens,
           |  round(CAST(sum(n_tokens_raw) AS DOUBLE) / sum(n_tokens_bpe), 6)
           |    AS compression
           |FROM j GROUP BY lang ORDER BY lang""".stripMargin
      case _ =>
        s"""WITH t0 AS (SELECT * FROM read_parquet('$workDir/bpe_t0_*.parquet')),
           |tR AS (SELECT * FROM read_parquet('$workDir/bpe_t${rounds}_*.parquet'))
           |SELECT t0.doc_id,
           |  CAST(len(t0.tk) AS INT) AS n_tokens_raw,
           |  CAST(COALESCE(len(tR.tk), len(t0.tk)) AS INT) AS n_tokens_bpe,
           |  COALESCE(array_to_string(tR.tk, ' '), array_to_string(t0.tk, ' '))
           |    AS encoded_text
           |FROM t0 LEFT JOIN tR USING (doc_id)
           |ORDER BY doc_id""".stripMargin
    }
    (t0 ++ roundSteps, finalSql)
  }

  def main(args: Array[String]): Unit = {
    val Array(auxDir, workDir, kStr, outJson) = args.take(4)
    val query = args.lift(4).getOrElse("x11")
    val (steps, finalSql) = query match {
      case "v3" | "v4" | "v5" => bpePlan(workDir, kStr.toInt, query)
      case "x10"       => x10Plan(auxDir, workDir, kStr.toInt)
      case _           => x11Plan(auxDir, workDir, kStr.toInt)
    }
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n") + "\""
    val json = s"""{"steps": [${steps.map(q).mkString(", ")}], "final": ${q(finalSql)}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json)
    println(s"[chunkedoracle] wrote ${steps.size}-step plan to $outJson")
  }
}
