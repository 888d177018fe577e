#!/bin/bash
# Same-window sf1/sf10 step capture for the ANN family (r18 verdict #1).
#
# The uniform sf10 lane's per-gate steps divide a lane-session numerator
# by a pair-session denominator captured HOURS apart — so a regime swing
# masquerades as a scaling change (r18: y3's step "doubled" 6.74 -> 13.8
# on a FLAT numerator, purely through a smaller sf1 denominator; y5/y6
# numerators grew ~50% on unchanged code). This lane closes the window:
# for each gate, the sf1 side and the sf10 side run back-to-back in one
# session — fresh quiet-gated JVMs minutes apart, runs=3 each (the
# median-of-3 convention the sf0.1 bench uses, r18 verdict #6) — so both
# ends of every ratio see the same regime by construction.
#
# Usage: tools/bench_ann_interleave.sh [sf1Dir] [sf10Dir] [outPrefix]
#   defaults: testdata/sf1 testdata/sf10 BENCH_r19ann
# Env: ANN_GATES to override the gate list.
# Merge with: python3 tools/ann_steps.py <outPrefix> <gatesCsv> <outJson>
set -eo pipefail
cd "$(dirname "$0")/.."
SF1=${1:-testdata/sf1}
SF10=${2:-testdata/sf10}
OUT=${3:-BENCH_r19ann}
GATES=${ANN_GATES:-y2_ann_lsh,y3_knn_graph,y5_ann_pq,y6_ann_ivfpq,x2_ngram_jaccard,x7_substring_dedup}
[ -d "$SF1" ]  || { echo "ERROR: $SF1 absent — regenerate with ScaleGen" >&2; exit 2; }
[ -d "$SF10" ] || { echo "ERROR: $SF10 absent — regenerate with ScaleGen" >&2; exit 2; }
# Declared warm-up convention (r19 verdict #2): y3's sf10 quiet captures
# were JIT-bimodal — 117.4 s cold-isolated vs 57.9 s warm in-lane, runs
# still declining at run 3 (124 -> 117 -> 76.5) — so a cold capture
# over-reads the gate ~2x. One untimed warm-up iteration per side puts
# every timed run in the warm band; Bench stamps env.warmup_runs so warm
# and cold artifacts are never silently compared.
WARMUP=${ANN_WARMUP_RUNS:-1}
for g in $(echo "$GATES" | tr ',' ' '); do
  echo "[ann $g] sf1 side  start loadavg=$(cut -d' ' -f1-3 /proc/loadavg)"
  SPARK_GRAFT_SF_DIR=$SF1 SPARK_GRAFT_ONLY=$g \
    SPARK_GRAFT_WARMUP_RUNS=$WARMUP \
    SPARK_GRAFT_BENCH_FULL=${OUT}_${g}_sf1.json \
    tools/run-main.sh graft.Bench 2>/dev/null | tail -1
  echo "[ann $g] sf10 side start loadavg=$(cut -d' ' -f1-3 /proc/loadavg)"
  SPARK_GRAFT_SF_DIR=$SF10 SPARK_GRAFT_ONLY=$g \
    SPARK_GRAFT_WARMUP_RUNS=$WARMUP \
    SPARK_GRAFT_BENCH_FULL=${OUT}_${g}_sf10.json \
    tools/run-main.sh graft.Bench 2>/dev/null | tail -1
done
python3 tools/ann_steps.py "$OUT" "$GATES" "${OUT}_steps.json"
