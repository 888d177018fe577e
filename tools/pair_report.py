#!/usr/bin/env python3
"""Summarize an interleaved pair capture (tools/bench_pair_interleaved.sh):
per pair, the raw sf0.1 -> sf1 ratio, plus each side's quiet_gate stamp.
Reports the median ratio and the max deviation between sibling pairs —
the r15 verdict #1 'agree within +/-0.10' gate.

The OLD per-pair calibration workload was retired in r18 (r17 verdict
#5: for two rounds the raw verdict was binding while the normalized
metric disagreed with itself and never changed a decision). When a
pre-r18 capture's cal files are present they are still read and the
normalized ratio printed, for archaeology only — the verdict is
raw-only. The r20 in-Bench calibration probe (env.calib) plays a
different, binary role here: it does not normalize any ratio, it
DISQUALIFIES pairs whose two sides demonstrably saw different host
regimes (see CALIB_SPLIT_MAX below).

Consensus fallback (r18 verdict #3): when the 0.10/3-sibling record
contract refuses (four honest sessions in r18), the de-facto headline
was a median computed BY HAND in SCALE.md. `--consensus <out>` makes it
machine-produced: writes a second-class artifact (median + IQR + pair
count + per-pair data) iff >= 9 pairs exist — fewer pairs are not
enough evidence to headline without sibling agreement. The 0.10 record
contract itself is unchanged.

Usage: tools/pair_report.py <outPrefix> <nPairs> [--consensus <outJson>]
"""
import os, sys, json, statistics

MIN_CONSENSUS_PAIRS = 9

# Inter-side regime-split gate (r20): interleaving alone does NOT
# guarantee the two sides of a pair share a regime — r20 pair 1 ran its
# sf0.1 side in a degraded host window (env.calib.total 3.358) and its
# sf1 side in a normal one (1.174): a 2.9x host-speed split that shrank
# the pair's ratio to 1.40 while both sides could still individually
# earn gate stamps. The fixed calibration probe (graft.Bench r20,
# min-of-5, 3.4% spread across fresh JVMs on a steady host) is stamped
# in every side, so the split is machine-detectable: a pair whose
# sides' calib totals differ by more than CALIB_SPLIT_MAX is
# regime-split and ineligible for the record AND the consensus.
# Pre-r20 artifacts carry no calib -> drift reads null and the pair
# stays eligible (can't judge what wasn't measured).
CALIB_SPLIT_MAX = 1.25


def side_calib(art):
    c = art.get("env", {}).get("calib")
    return c.get("total") if isinstance(c, dict) else None


def calib_drift(a, b):
    """max/min ratio of the two sides' calib totals, or None."""
    ca, cb = side_calib(a), side_calib(b)
    if ca and cb and ca > 0 and cb > 0:
        return max(ca, cb) / min(ca, cb)
    return None


def regime_split(a, b):
    d = calib_drift(a, b)
    return d is not None and d > CALIB_SPLIT_MAX


def read_pairs(prefix, n):
    rows = []
    for i in range(1, n + 1):
        a = json.load(open(f"{prefix}_sf0.1_{i}.json"))
        b = json.load(open(f"{prefix}_sf1_{i}.json"))
        rows.append((i, a, b, b["value"] / a["value"]))
    return rows


def write_consensus(prefix, n, out):
    rows = read_pairs(prefix, n)
    # r19 advice: a timeout/waived/suspect side must not silently skew a
    # headline whose note claims "regime-matched" — only pairs with BOTH
    # sides stamped plain "passed" enter the median (passed_elevated is
    # excluded too: an in-band-but-warm side is exactly the regime drift
    # the consensus exists to cancel). Excluded pairs stay visible in
    # the artifact with the gate stamps that disqualified them.
    def gates(a, b):
        return [a.get("env", {}).get("quiet_gate"),
                b.get("env", {}).get("quiet_gate")]

    def thresholds(a, b):
        # gate DISCIPLINE stamp (r20 Bench stamps env.quiet_load_thr):
        # two "passed" strings earned under different LOAD5 thresholds
        # are now distinguishable in the artifact itself
        return [a.get("env", {}).get("quiet_load_thr"),
                b.get("env", {}).get("quiet_load_thr")]

    def eligible(a, b):
        return all(g == "passed" for g in gates(a, b)) and not regime_split(a, b)

    included = [(i, a, b, r) for i, a, b, r in rows if eligible(a, b)]
    excluded = [(i, gates(a, b), calib_drift(a, b)) for i, a, b, r in rows
                if not eligible(a, b)]
    if excluded:
        print(f"consensus: excluded pairs (side gate != passed, or calib "
              f"drift > {CALIB_SPLIT_MAX}): "
              f"{[(i, g, d) for i, g, d in excluded]}", file=sys.stderr)
    if len(included) < MIN_CONSENSUS_PAIRS:
        print(f"ERROR: consensus needs >= {MIN_CONSENSUS_PAIRS} pairs with "
              f"both sides quiet_gate=passed, got {len(included)} "
              f"(of {len(rows)} captured)", file=sys.stderr)
        return 1
    ratios = sorted(r[3] for r in included)
    q = statistics.quantiles(ratios, n=4, method="inclusive")
    art = {
        "metric": "sf0.1->sf1 ratio (consensus of interleaved pairs)",
        "value": round(statistics.median(ratios), 4),
        "unit": "ratio",
        "pairs": len(included),
        "pairs_captured": len(rows),
        "pairs_excluded": [{"i": i, "quiet_gate": g,
                            "calib_drift": round(d, 3) if d else None}
                           for i, g, d in excluded],
        "calib_split_max": CALIB_SPLIT_MAX,
        "iqr": [round(q[0], 4), round(q[2], 4)],
        "spread": [round(ratios[0], 4), round(ratios[-1], 4)],
        "per_pair": [
            {"i": i, "sf0.1": a["value"], "sf1": b["value"],
             "ratio": round(r, 4),
             "quiet_gate": gates(a, b),
             "quiet_load_thr": thresholds(a, b),
             "calib": [side_calib(a), side_calib(b)],
             "calib_drift": (round(calib_drift(a, b), 3)
                             if calib_drift(a, b) else None)}
            for i, a, b, r in included],
        "note": ("second-class headline: the 0.10/3-sibling record contract "
                 "refused, so the machine-produced median over the "
                 "regime-matched interleaved pairs (both sides "
                 "quiet_gate=passed; others excluded above) stands in "
                 "(r18 verdict #3); a pair of record supersedes this "
                 "artifact whenever one exists"),
    }
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(f"consensus ({len(included)} pairs, {len(excluded)} excluded): "
          f"median={art['value']} iqr={art['iqr']} -> {out}")
    return 0


def main(prefix, n):
    rows, cals, splits = [], [], []
    for i in range(1, n + 1):
        a = json.load(open(f"{prefix}_sf0.1_{i}.json"))
        b = json.load(open(f"{prefix}_sf1_{i}.json"))
        raw = b["value"] / a["value"]
        gates = (a.get("env", {}).get("quiet_gate", "?"),
                 b.get("env", {}).get("quiet_gate", "?"))
        rows.append((i, a["value"], b["value"], raw))
        drift = calib_drift(a, b)
        split = regime_split(a, b)
        if split:
            splits.append(i)
        line = (f"pair {i}: sf0.1={a['value']:.1f}s sf1={b['value']:.1f}s "
                f"raw={raw:.3f} quiet_gate=({gates[0]},{gates[1]})"
                + (f" calib_drift={drift:.2f}" if drift else "")
                + (" REGIME-SPLIT" if split else ""))
        # legacy (pre-r18) captures carry calibration probes — read if BOTH
        # sides are present (a side that crashed mid-pair leaves cal_a
        # without cal_b; the archaeology line is then skipped, not fatal)
        if (os.path.exists(f"{prefix}_cal_a{i}.json")
                and os.path.exists(f"{prefix}_cal_b{i}.json")):
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
    if splits:
        # a record built on a ratio whose two sides saw different hosts
        # (calib split > CALIB_SPLIT_MAX) is not a record, whatever the
        # sibling spread says
        print(f"regime-split pairs (calib drift > {CALIB_SPLIT_MAX}): "
              f"{splits} -> record refused")
    return 0 if raw_ok and not splits else 1


if __name__ == "__main__":
    if len(sys.argv) > 4 and sys.argv[3] == "--consensus":
        sys.exit(write_consensus(sys.argv[1], int(sys.argv[2]), sys.argv[4]))
    sys.exit(main(sys.argv[1], int(sys.argv[2])))
