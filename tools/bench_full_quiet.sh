#!/bin/bash
# Quiet-gated recapture of the driver-parsed headline artifact
# (r16 verdict #2): BENCH_full.json was captured in a contended
# session (load_before [5.29, 3.65, 7.72]) and its per-query medians
# disagreed with the committed pair of record by up to 47 %. This
# script is the ONLY sanctioned way to refresh BENCH_full.json: it
# reuses the interleaved capture's quiet-start gate (wait for 1-min
# load < 2, capped so a genuinely busy host fails loudly), captures
# the full surface at sf0.1, then ASSERTS the artifact it just wrote
# was quiet-started — a contended capture aborts instead of shipping.
#
# Usage: tools/bench_full_quiet.sh [outJson]   (default BENCH_full.json)
set -e
cd "$(dirname "$0")/.."
OUT=${1:-BENCH_full.json}
SF=${SF01_DIR:-/root/testdata/sf0.1}
for _ in $(seq 1 60); do
  l1=$(cut -d' ' -f1 /proc/loadavg)
  awk -v l="$l1" 'BEGIN{exit !(l < 2.0)}' && break
  sleep 10
done
l1=$(cut -d' ' -f1 /proc/loadavg)
awk -v l="$l1" 'BEGIN{exit !(l < 2.0)}' || {
  echo "ERROR: loadavg still $l1 after 10 min — not capturing." >&2; exit 2; }
echo "[full] quiet start loadavg=$(cut -d' ' -f1-3 /proc/loadavg)"
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_BENCH_FULL=$OUT \
  tools/run-main.sh graft.Bench 2>/dev/null | tail -1
# the artifact stamps load_before itself; enforce the <2 convention on
# what was actually written (the JVM start is moments after the gate,
# but assert on the recorded stamp, not our racy pre-check)
python3 - "$OUT" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
lb = d["env"]["load_before"]
l1 = lb[0]
assert l1 < 2.0, f"load_before {lb} fails the quiet gate — artifact is contended, recapture"
print(f"[full] OK load_before={lb} total={d['value']:.2f}s")
EOF
