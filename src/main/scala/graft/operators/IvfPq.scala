package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ: the [[Ivf]] coarse quantizer routes each query to its
  * `nprobe` inverted lists, and candidates inside those lists are scored
  * in the COMPRESSED domain with [[Pq]] ADC — the FAISS IVFPQ shape, and
  * the composition the two operators exist for at 100 TB:
  *
  *  - IVF bounds WHICH rows are touched (≈ nprobe/C of the corpus per
  *    query);
  *  - PQ bounds WHAT each touched row costs and carries — the corpus
  *    side of the join is (id, cluster_id, codes[m]): the raw vectors
  *    are dropped in the SAME map-side projection that assigns and
  *    encodes them, so neither the scan output, the join, nor the
  *    top-k exchange ever carries a vector.
  *
  * Plan shape (inherited from both parents, asserted in spec): corpus
  * scan → one map-side assign+encode projection → broadcast-hash join
  * against (query_id, cluster_id, lut) → m-lookup ADC fold → the ONLY
  * wide exchange carries already-scored (query, neighbor, adc) triples
  * into the per-query top-k window.
  *
  * Determinism/oracle: both quantizers seed from the same modulo-spread
  * sample as their parents (SQL-expressible), so the ENTIRE composed
  * path — coarse assignment, probe lists, codes, lookup tables, ordered
  * ADC fold, ranking — hash-matches in DuckDB (`y6_ann_ivfpq`).
  * Output: (query_id, rank, neighbor_id, adc_dist), ranked by rounded
  * ADC ascending, ties to the smaller neighbor id. */
object IvfPq {

  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String,
                queryIds: Seq[Long], k: Int = 10, c: Int = 16,
                nprobe: Int = 4, m: Int = 8, ks: Int = 16,
                stride: Long = 7L): DataFrame = {
    val cents = Ivf.seedCentroids(emb, idCol, vecCol, c, stride)
    val books = Pq.seedCodebooks(emb, idCol, vecCol, m, ks, stride)
    val v = Similarity.toDouble(col(vecCol))
    // ONE map-side projection: cluster assignment + PQ encode, raw
    // vector dropped here — the scan emits (id, cluster_id, codes) only.
    // The scan is fanned out first when narrow (r20): assign+encode is
    // (c + m·ks)·d multiply-adds per vector and otherwise serializes on
    // a single-split input — no-op at corpus scale (Fanout)
    val corpus = graft.core.Fanout.spread(emb, col(idCol))
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"),
        element_at(Ivf.nearestCids(v, cents, 1), 1).as("cluster_id"),
        Pq.codesCol(v, books).as("codes"))
    // queries broadcast with probe list AND lookup table (both computed
    // once per query row, before the explode multiplies rows)
    val probes = emb.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"),
        Pq.lutCol(v, books).as("lut"),
        explode(Ivf.nearestCids(v, cents, math.min(nprobe, cents.size)))
          .as("cluster_id"))
    // a corpus row lives in exactly ONE list and probe cids are distinct
    // per query -> each (query, candidate) pair appears at most once
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    corpus
      .join(broadcast(probes), Seq("cluster_id"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(Pq.adcCol(col("lut"), col("codes"), m), 6).as("adc_dist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "adc_dist")
  }
}
