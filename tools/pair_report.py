#!/usr/bin/env python3
"""Summarize an interleaved pair capture (tools/bench_pair_interleaved.sh):
per pair, the raw sf0.1 -> sf1 ratio and a calibration-normalized ratio
(raw scaled by cal_a/cal_b — if the host slowed between the two sides of
a pair, the calibration probe slowed with it, and the normalization
cancels the drift). Reports the median of each and the max deviation
between sibling pairs, the r15 verdict #1 'agree within +/-0.10' gate.

Usage: tools/pair_report.py <outPrefix> <nPairs>
"""
import sys, json, statistics


def main(prefix, n):
    rows = []
    for i in range(1, n + 1):
        a = json.load(open(f"{prefix}_sf0.1_{i}.json"))
        b = json.load(open(f"{prefix}_sf1_{i}.json"))
        ca = json.load(open(f"{prefix}_cal_a{i}.json"))
        cb = json.load(open(f"{prefix}_cal_b{i}.json"))
        raw = b["value"] / a["value"]
        cal = raw * (ca["value"] / cb["value"])
        rows.append((i, a["value"], b["value"], raw, ca["value"], cb["value"], cal))
        print(f"pair {i}: sf0.1={a['value']:.1f}s sf1={b['value']:.1f}s "
              f"raw={raw:.3f} cal_a={ca['value']:.2f} cal_b={cb['value']:.2f} "
              f"normalized={cal:.3f}")
    raws = sorted(r[3] for r in rows)
    cals = sorted(r[6] for r in rows)
    print(f"median raw ratio      = {statistics.median(raws):.3f} "
          f"(spread {raws[0]:.3f}..{raws[-1]:.3f}, max dev {raws[-1]-raws[0]:.3f})")
    print(f"median normalized     = {statistics.median(cals):.3f} "
          f"(spread {cals[0]:.3f}..{cals[-1]:.3f}, max dev {cals[-1]-cals[0]:.3f})")
    # Two SEPARATE verdicts (r16 advice — an OR let a tight raw spread
    # print YES while the drift-corrected ratios disagreed): raw is the
    # number of record, normalized is the drift-corrected stability
    # check. The pair-of-record contract (bench_pair_interleaved.sh)
    # gates on the raw verdict; a NO on normalized flags host drift the
    # calibration couldn't cancel.
    raw_ok = (raws[-1] - raws[0]) <= 0.10
    cal_ok = (cals[-1] - cals[0]) <= 0.10
    print(f"raw sibling agreement within +/-0.10:        {'YES' if raw_ok else 'NO'}")
    print(f"normalized sibling agreement within +/-0.10: {'YES' if cal_ok else 'NO'}")
    return 0 if raw_ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], int(sys.argv[2])))
