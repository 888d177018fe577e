#!/bin/bash
# Interleaved sf0.1/sf1 pair capture (r15 verdict #1): the committed
# ratio's denominator (sf0.1 total) historically swung ±20% with the
# host regime BETWEEN capture sessions, bracketing the ratio at
# [1.57, 1.91] on identical code. Fix: alternate the two sides within
# ONE session so each pair (A_i, B_i) shares a regime by construction.
#
# CALIBRATION PROBE RETIRED (r17 verdict #5, decided r18): for two
# consecutive rounds the raw sibling-agreement gate was the binding
# contract while the calibration-normalized ratios disagreed with
# themselves (r17: raw spread 0.095 PASS vs normalized 0.221) and never
# changed a verdict; the probe cost ~2 min of wall per pair for a drift
# stamp nobody consumed. The pair's quiet-start discipline now lives in
# graft.Bench itself (env.quiet_gate), which stamps regime drift per
# side more directly than the probe did. pair_report.py still reads old
# captures' cal files when present.
#
# Usage: tools/bench_pair_interleaved.sh <outPrefix> [nPairs] [startIdx]
# Produces, per pair i: <p>_sf0.1_$i.json, <p>_sf1_$i.json
# startIdx lets a later session APPEND pairs to an earlier capture set
# (same prefix): the report/record/consensus then runs over pairs
# 1..startIdx+nPairs-1. Summarize with tools/pair_report.py.
set -eo pipefail
cd "$(dirname "$0")/.."
OUT=${1:?usage: bench_pair_interleaved.sh <outPrefix> [nPairs] [startIdx]}
PAIRS=${2:-3}
START=${3:-1}
TOTAL=$((START + PAIRS - 1))
SF01=${SF01_DIR:-/root/testdata/sf0.1}
SF1=${SF1_DIR:-/root/repo/testdata/sf1}
# Quiet-start gate before EVERY side now lives inside graft.Bench
# (r17 verdict #1): back-to-back interleaving leaves the just-exited
# JVM's residual loadavg on the next side's start (the 1-min average
# decays e-fold per minute), and Bench waits it out itself, stamping
# env.quiet_gate in each artifact.
#
# Pair-of-record contract (r16 verdict #5, promoted from SCALE.md prose
# into assertions so a future round can't accidentally commit a
# single-session pair): a pair-of-record requires >= 3 sibling pairs
# captured in ONE session whose raw ratios agree within +/-0.10
# (pair_report.py's raw verdict). The median pair is the pair of record.
if [ "$TOTAL" -lt 3 ]; then
  echo "ERROR: pair-of-record requires >= 3 sibling pairs (got $TOTAL)." >&2
  echo "       Run with nPairs >= 3, or treat this capture as a scratch probe." >&2
  exit 2
fi
for i in $(seq "$START" "$TOTAL"); do
  echo "[pair $i] start loadavg=$(cut -d' ' -f1-3 /proc/loadavg)"
  SPARK_GRAFT_SF_DIR=$SF01 SPARK_GRAFT_BENCH_FULL=${OUT}_sf0.1_$i.json \
    tools/run-main.sh graft.Bench 2>/dev/null | tail -1
  SPARK_GRAFT_SF_DIR=$SF1 SPARK_GRAFT_BENCH_FULL=${OUT}_sf1_$i.json \
    tools/run-main.sh graft.Bench 2>/dev/null | tail -1
  echo "[pair $i] done loadavg=$(cut -d' ' -f1-3 /proc/loadavg)"
done
# Emit the pair-of-record ONLY if the sibling-agreement gate passes:
# pair_report.py exits non-zero when the raw ratios spread > 0.10.
# With START > 1 the pair set spans multiple sessions, and the record
# contract requires >= 3 sibling pairs captured in ONE session (r19
# advice) — appended sets go straight to the consensus path, which is
# the only cross-session convention.
if [ "$START" -gt 1 ]; then
  echo "[pair] START=$START: multi-session pair set — record contract" >&2
  echo "       requires one session; evaluating the consensus path only" >&2
  python3 tools/pair_report.py "$OUT" "$TOTAL" || true
  if python3 tools/pair_report.py "$OUT" "$TOTAL" --consensus "${OUT}_consensus.json"; then
    echo "consensus artifact emitted: ${OUT}_consensus.json (multi-session set; no record)"
    exit 0
  else
    echo "ERROR: multi-session set and not enough passed pairs for a consensus (>=9)." >&2
    exit 3
  fi
fi
if python3 tools/pair_report.py "$OUT" "$TOTAL"; then
  python3 - "$OUT" "$TOTAL" <<'EOF'
import json, sys, statistics, shutil
p, n = sys.argv[1], int(sys.argv[2])
pairs = []
for i in range(1, n + 1):
    a = json.load(open(f"{p}_sf0.1_{i}.json"))
    b = json.load(open(f"{p}_sf1_{i}.json"))
    pairs.append((b["value"] / a["value"], i))
pairs.sort()
_, rec = pairs[len(pairs) // 2]  # median-ratio pair = pair of record
for side in ("sf0.1", "sf1"):
    shutil.copy(f"{p}_{side}_{rec}.json", f"{p}_record_{side}.json")
print(f"pair of record = pair {rec} -> {p}_record_sf0.1.json / {p}_record_sf1.json")
EOF
else
  echo "record contract refused (spread > 0.10) — trying the consensus fallback" >&2
  # r18 verdict #3: when the record is refused but >= 9 regime-matched
  # pairs exist, the machine emits the second-class consensus artifact
  # (median + IQR + pair count) instead of SCALE.md hand-arithmetic.
  if python3 tools/pair_report.py "$OUT" "$TOTAL" --consensus "${OUT}_consensus.json"; then
    echo "consensus artifact emitted: ${OUT}_consensus.json (record still refused)"
  else
    echo "ERROR: record refused AND not enough pairs for a consensus (>=9)." >&2
    echo "       Append more pairs: bench_pair_interleaved.sh $OUT <n> $((TOTAL + 1))" >&2
    exit 3
  fi
fi
