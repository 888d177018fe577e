#!/bin/bash
# Two-half bench capture (r14 verdict #2): run the full surface as two
# JVM invocations split alphabetically, so late-alphabet queries are not
# inflated by driver heap/JIT context accumulated over 90+ prior
# queries. Usage: tools/bench_halves.sh <sfDir> <outPrefix>
# Produces <outPrefix>_h1.json and <outPrefix>_h2.json; merge with
# tools/merge_bench_halves.py (which validates the union against
# tools/query_names.txt).
#
# The half lists are DERIVED from the versioned registry snapshot
# tools/query_names.txt (kept in sync with SparkEntry.queries by
# QueryRegistrySpec), split at 't' — r15 advice: unversioned /tmp lists
# could silently produce a merged artifact missing queries.
set -e
cd "$(dirname "$0")/.."
SF=$1; OUT=$2
H1=$(grep -v '^[t-z]' tools/query_names.txt | paste -sd,)
H2=$(grep '^[t-z]' tools/query_names.txt | paste -sd,)
echo "[halves] sf=$SF loadavg=$(cut -d' ' -f1-3 /proc/loadavg)"
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_ONLY=$H1 SPARK_GRAFT_BENCH_FULL=${OUT}_h1.json \
  tools/run-main.sh graft.Bench 2>/dev/null | tail -1
sleep 45
echo "[halves] between loadavg=$(cut -d' ' -f1-3 /proc/loadavg)"
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_ONLY=$H2 SPARK_GRAFT_BENCH_FULL=${OUT}_h2.json \
  tools/run-main.sh graft.Bench 2>/dev/null | tail -1
