#!/bin/bash
# Mechanical determinism lane (r16 verdict #1): the sampled-range-boundary
# bug shipped TWICE (Warehouse.withDenseKeyRanged r14, Packing.packSequences
# r16), each time invisible to the sf0.01 DuckDB gate because a reused
# exchange masked it, each time caught only by a hand-written one-off pin.
# This lane makes the check mechanical and recurring: run EVERY gate twice
# in fresh JVMs with spark.sql.adaptive.enabled=false — the configuration
# that defeats exchange reuse, i.e. the one under which an unpinned
# sampled-boundary plan actually diverges (AQE-off experiments on the
# unpinned r16 bug: 40,228 / 40,262 trial-varying mismatches; pinned: 0) —
# and diff full result hashes between the two runs.
#
# Usage: tools/determinism_lane.sh [sfDir] [outJson]
#   default sfDir=/root/testdata/sf0.01, outJson=DETERMINISM_r17.json
# Env: SPARK_GRAFT_VERIFY_ONLY=a,b,c to target a subset while iterating.
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-DETERMINISM_r17.json}
RUN1=${DET_DIR1:-/tmp/det_run1}
RUN2=${DET_DIR2:-/tmp/det_run2}
rm -rf "$RUN1" "$RUN2" "${RUN1}_aux" "${RUN2}_aux"
echo "[det] run 1 (fresh JVM, AQE off) -> $RUN1"
SPARK_GRAFT_AQE=false tools/run-main.sh graft.Verify "$SF" "$RUN1" 2>/dev/null
echo "[det] run 2 (fresh JVM, AQE off) -> $RUN2"
SPARK_GRAFT_AQE=false tools/run-main.sh graft.Verify "$SF" "$RUN2" 2>/dev/null
# a query that FAILED in either run must read as a lane failure, not a
# silent shrink of the compared set — surface both ledgers
for r in "$RUN1" "$RUN2"; do
  if [ -s "${r}_errors.json" ] && [ "$(cat "${r}_errors.json")" != "{}" ]; then
    echo "[det] ERROR: failures in ${r}_errors.json:"; cat "${r}_errors.json"; echo
  fi
done
python3 tools/det_diff.py "$RUN1" "$RUN2" "$OUT"
