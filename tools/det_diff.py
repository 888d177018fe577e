#!/usr/bin/env python3
"""Differ for the mechanical determinism lane (tools/determinism_lane.sh).

Given two Verify output dirs produced by independent fresh-JVM runs of
graft.Verify (same data, same code, AQE off), compares every query's full
result: columns sorted by name, rows sorted by their stringified tuple,
then a sha256 over the exact CSV bytes (Python float repr is
shortest-roundtrip, so two float64 values hash equal iff they are
bit-equal). A mismatch means the query's RESULT VALUES depend on
something the plan does not pin — the sampled-range-boundary bug class
(Warehouse r14, Packing r16) produced exactly this signature.

Usage: tools/det_diff.py <run1_dir> <run2_dir> <out_json> [expected_count]
Exit 0 iff every query hashes identical; writes a JSON artifact either way.

expected_count (r17 advice, the 'silent shrink' hole): a gate that fails
IDENTICALLY in both runs leaves both dirs without it — the compared sets
stay symmetric and the diff would happily report DETERMINISTIC over a
shrunken surface. When the caller knows how many gates it asked for,
passing that count makes a shrink a hard INCOMPLETE failure.
"""
import sys, os, glob, json, hashlib
import pandas as pd


def query_hash(pq_dir: str):
    files = sorted(glob.glob(f"{pq_dir}/*.parquet"))
    if not files:
        return None, 0
    df = pd.concat([pd.read_parquet(f) for f in files])
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    # row order is not part of any gate's contract unless the query
    # itself sorts — normalize by sorting on the stringified row tuple
    # so a determinism diff never fires on a permutation
    if len(df):
        key = df.astype(str).agg("\x1f".join, axis=1)
        df = df.iloc[key.sort_values(kind="stable").index].reset_index(drop=True)
    body = df.to_csv(index=False).encode()
    return hashlib.sha256(body).hexdigest(), len(df)


def main(run1: str, run2: str, out_json: str, expected: int | None = None) -> int:
    names1 = sorted(d for d in os.listdir(run1)
                    if os.path.isdir(os.path.join(run1, d)))
    names2 = sorted(d for d in os.listdir(run2)
                    if os.path.isdir(os.path.join(run2, d)))
    report = {"run1": run1, "run2": run2, "n_queries": 0,
              "diff0": 0, "mismatch": [], "missing": []}
    if names1 != names2:
        report["missing"] = sorted(set(names1) ^ set(names2))
        print(f"WARN query sets differ: {report['missing']}")
    for name in sorted(set(names1) & set(names2)):
        h1, n1 = query_hash(os.path.join(run1, name))
        h2, n2 = query_hash(os.path.join(run2, name))
        report["n_queries"] += 1
        if h1 is not None and h1 == h2:
            report["diff0"] += 1
            print(f"DIFF0 {name} ({n1} rows)")
        else:
            report["mismatch"].append({"query": name, "rows": [n1, n2],
                                       "hash": [h1, h2]})
            print(f"MISMATCH {name}: rows {n1} vs {n2}, hash {h1} vs {h2}")
    ok = (report["diff0"] == report["n_queries"]
          and not report["missing"] and report["n_queries"] > 0)
    if expected is not None:
        report["expected"] = expected
        if report["n_queries"] != expected:
            print(f"ERROR: compared {report['n_queries']} queries but the "
                  f"caller asked for {expected} — a gate failed in BOTH runs "
                  "(silent shrink)")
            ok = False
    report["verdict"] = ("DETERMINISTIC" if ok else
                         "INCOMPLETE" if expected is not None
                         and report["n_queries"] != expected
                         else "NONDETERMINISTIC")
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\n{report['diff0']}/{report['n_queries']} diff-0 -> "
          f"{report['verdict']} ({out_json})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3],
                  int(sys.argv[4]) if len(sys.argv) > 4 else None))
