#!/bin/bash
# Recurring big-SF bench lane with AUTO-ADJUDICATION (r17 verdict #3).
#
# The lane runs its gates back-to-back in one JVM at sf10, which
# saturates the box (in-run loads 14-17) — an honest throughput reading
# for the lane as a whole, but two rounds running it manufactured one
# over-linear per-gate step (y3: 12.9x r16, 10.1x r17) that a manual
# quiet isolated rerun then retracted (7.2x, 6.74x). This script bakes
# the retraction in: after the lane capture, any gate whose step vs the
# quiet sf1 denominator exceeds ADJ_THRESHOLD (default 8x) is re-run
# ALONE in a fresh JVM (quiet-gated by graft.Bench itself), and
# tools/sf10_adjudicate.py merges the isolated numbers into the
# artifact of record with per-gate `adjudicated` fields.
#
# r17 verdict #4: x9_paragraph_dedup and nb1_nb_classifier join the
# uniform lane (they were already in the zipf lane, so their sf10
# zipf/uniform cells were uncomputable — the "—" cells in SCALE.md).
#
# Usage: tools/bench_sf10_lane.sh [sf10Dir] [denomJson] [outJson]
#   defaults: testdata/sf10, BENCH_r18f_record_sf1.json, BENCH_sf10_r18.json
# Env: SF10_GATES to override the gate list (e.g. for the zipf lane).
set -eo pipefail
cd "$(dirname "$0")/.."
SF10=${1:-testdata/sf10}
DENOM=${2:-BENCH_r18f_record_sf1.json}
OUT=${3:-BENCH_sf10_r18.json}
THR=${ADJ_THRESHOLD:-8.0}
GATES=${SF10_GATES:-cur5_curation_chain,nb1_nb_classifier,t10_bigram_lm,x10_cluster_keep_best,x11_cross_dedup,x12_incremental_dedup,x13_edit_distance,x2_ngram_jaccard,x3_minhash_lsh,x4_simhash,x6_dup_clusters,x7_substring_dedup,x8_dup_clusters_star,x9_paragraph_dedup,y2_ann_lsh,y3_knn_graph,y5_ann_pq,y6_ann_ivfpq}
[ -d "$SF10" ] || { echo "ERROR: $SF10 absent — regenerate with ScaleGen" >&2; exit 2; }
[ -s "$DENOM" ] || { echo "ERROR: denominator $DENOM absent — capture the pair first" >&2; exit 2; }
RAW=${OUT%.json}_raw.json
echo "[sf10] lane capture ($(echo "$GATES" | tr ',' '\n' | grep -c .) gates) -> $RAW"
SPARK_GRAFT_SF_DIR=$SF10 SPARK_GRAFT_ONLY=$GATES SPARK_GRAFT_BENCH_FULL=$RAW \
  tools/run-main.sh graft.Bench 2>/dev/null | tail -1
NEED=$(python3 tools/sf10_adjudicate.py list "$RAW" "$DENOM" "$THR")
ADJP=/tmp/sf10_adj_
for g in $NEED; do
  echo "[sf10] step > ${THR}x for $g — isolated quiet rerun"
  SPARK_GRAFT_SF_DIR=$SF10 SPARK_GRAFT_ONLY=$g \
    SPARK_GRAFT_BENCH_FULL=${ADJP}${g}.json \
    tools/run-main.sh graft.Bench 2>/dev/null | tail -1
done
python3 tools/sf10_adjudicate.py merge "$RAW" "$DENOM" "$THR" "$OUT" "$ADJP"
