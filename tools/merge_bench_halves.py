#!/usr/bin/env python3
"""Merge two half-surface bench JSONs (tools/bench_halves.sh) into one
full-surface artifact. Per-query fields (queries/spread/times/loads)
union disjointly; value = sum of totals; env keeps BOTH halves'
load_before/load_after so quietness is auditable per half; a `halves`
note records the capture method."""
import sys, json, os

def main(h1_path, h2_path, out_path):
    h1, h2 = json.load(open(h1_path)), json.load(open(h2_path))
    overlap = set(h1["queries"]) & set(h2["queries"])
    assert not overlap, f"halves overlap: {overlap}"
    # completeness (r15 advice): a stale/partial half list must not
    # silently produce a merged artifact missing queries — the union
    # must be EXACTLY the versioned registry snapshot (which
    # QueryRegistrySpec pins to SparkEntry.queries).
    names_path = os.path.join(os.path.dirname(__file__), "query_names.txt")
    expected = set(open(names_path).read().split())
    got = set(h1["queries"]) | set(h2["queries"])
    assert got == expected, (
        f"halves union != tools/query_names.txt: "
        f"missing={sorted(expected - got)} extra={sorted(got - expected)}")
    out = dict(h1)
    for k in ("queries", "spread", "times", "loads"):
        out[k] = {**h1.get(k, {}), **h2.get(k, {})}
    out["bimodal"] = {**h1.get("bimodal", {}), **h2.get("bimodal", {})}
    out["value"] = h1["value"] + h2["value"]
    out["env"] = {"half1": h1.get("env"), "half2": h2.get("env")}
    out["halves"] = ("two JVM invocations split alphabetically at 't' "
                     "(r14 verdict #2: isolate late-alphabet queries from "
                     "driver heap/JIT context)")
    json.dump(out, open(out_path, "w"))
    print(f"merged {len(out['queries'])} queries -> {out_path} "
          f"total={out['value']:.1f}s")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
