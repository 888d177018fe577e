#!/usr/bin/env python3
"""Summarize an interleaved pair capture (tools/bench_pair_interleaved.sh):
per pair, the raw sf0.1 -> sf1 ratio, plus each side's quiet_gate stamp.
Reports the median ratio and the max deviation between sibling pairs —
the r15 verdict #1 'agree within +/-0.10' gate.

The calibration probe was retired in r18 (r17 verdict #5: for two rounds
the raw verdict was binding while the normalized metric disagreed with
itself and never changed a decision). When a pre-r18 capture's cal
files are present they are still read and the normalized ratio printed,
for archaeology only — the verdict is raw-only.

Usage: tools/pair_report.py <outPrefix> <nPairs>
"""
import os, sys, json, statistics


def main(prefix, n):
    rows, cals = [], []
    for i in range(1, n + 1):
        a = json.load(open(f"{prefix}_sf0.1_{i}.json"))
        b = json.load(open(f"{prefix}_sf1_{i}.json"))
        raw = b["value"] / a["value"]
        gates = (a.get("env", {}).get("quiet_gate", "?"),
                 b.get("env", {}).get("quiet_gate", "?"))
        rows.append((i, a["value"], b["value"], raw))
        line = (f"pair {i}: sf0.1={a['value']:.1f}s sf1={b['value']:.1f}s "
                f"raw={raw:.3f} quiet_gate=({gates[0]},{gates[1]})")
        # legacy (pre-r18) captures carry calibration probes — read if present
        if os.path.exists(f"{prefix}_cal_a{i}.json"):
            ca = json.load(open(f"{prefix}_cal_a{i}.json"))
            cb = json.load(open(f"{prefix}_cal_b{i}.json"))
            cal = raw * (ca["value"] / cb["value"])
            cals.append(cal)
            line += f" [legacy normalized={cal:.3f}]"
        print(line)
    raws = sorted(r[3] for r in rows)
    print(f"median raw ratio      = {statistics.median(raws):.3f} "
          f"(spread {raws[0]:.3f}..{raws[-1]:.3f}, max dev {raws[-1]-raws[0]:.3f})")
    if cals:
        cals.sort()
        print(f"legacy normalized     = {statistics.median(cals):.3f} "
              f"(spread {cals[0]:.3f}..{cals[-1]:.3f}) [not a verdict]")
    raw_ok = (raws[-1] - raws[0]) <= 0.10
    print(f"raw sibling agreement within +/-0.10:        {'YES' if raw_ok else 'NO'}")
    return 0 if raw_ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], int(sys.argv[2])))
