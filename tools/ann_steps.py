#!/usr/bin/env python3
"""Merge a bench_ann_interleave.sh capture into one step artifact.

Per gate: the sf1 and sf10 headline (stable-median of 3), their raw
times and quiet-gate stamps, and the SAME-WINDOW 10x step — both sides
of each ratio captured minutes apart in one session, so regime drift
cancels instead of masquerading as a scaling change (r18 verdict #1).

Optionally folds in candidate-volume counters (graft.tools.AnnCounters
output for both SFs): step_candidates = the gate's candidate-volume
growth at 10x data, the COMPUTE share of the measured step. A measured
step well above the candidate step is environment/per-task constants,
not super-linear work.

Usage: ann_steps.py <outPrefix> <gatesCsv> <outJson>
                    [<countersSf1Json> <countersSf10Json>]
"""
import sys, json

# gate -> (counter section, volume field) in AnnCounters output
COUNTER_FIELDS = {
    "y2_ann_lsh": ("y2", "candidates_pre_distinct"),
    "y3_knn_graph": ("y3", "candidates_pre_distinct"),
    "y5_ann_pq": ("y5", "scored_pairs"),
    "y6_ann_ivfpq": ("y6", "adc_scored_candidates"),
}


def main():
    prefix, gates, out = sys.argv[1], sys.argv[2].split(","), sys.argv[3]
    counters = None
    if len(sys.argv) > 5:
        c1 = json.load(open(sys.argv[4]))
        c10 = json.load(open(sys.argv[5]))
        counters = (c1, c10)
    table, bad_gates = {}, []
    for g in gates:
        a = json.load(open(f"{prefix}_{g}_sf1.json"))
        b = json.load(open(f"{prefix}_{g}_sf10.json"))
        t1, t10 = a["queries"][g], b["queries"][g]
        # Bench stamps -1.0 when every run of a gate failed: a ratio over
        # a sentinel (or any non-positive time) is meaningless and must
        # refuse loudly, not pass at step=1.0 (r19 advice — same loud
        # no-denominator refusal sf10_adjudicate.py already has)
        if t1 <= 0 or t10 <= 0:
            print(f"[ann_steps] ERROR: non-positive headline for {g}: "
                  f"sf1={t1} sf10={t10} (failed-runs sentinel?)",
                  file=sys.stderr)
            return 1
        gates_ok = (a["env"].get("quiet_gate"), b["env"].get("quiet_gate"))
        row = {
            "sf1": t1, "sf10": t10,
            "step_same_window": round(t10 / t1, 2),
            "runs": [a.get("runs"), b.get("runs")],
            "times_sf1": json.loads(json.dumps(a.get("times", {}).get(g))),
            "times_sf10": json.loads(json.dumps(b.get("times", {}).get(g))),
            "quiet_gate": list(gates_ok),
            "warmup_runs": [a["env"].get("warmup_runs"),
                            b["env"].get("warmup_runs")],
        }
        if any(v not in ("passed",) for v in gates_ok):
            bad_gates.append(g)
        if counters and g in COUNTER_FIELDS:
            sec, field = COUNTER_FIELDS[g]
            v1, v10 = counters[0][sec][field], counters[1][sec][field]
            if v1 <= 0:
                print(f"[ann_steps] ERROR: zero/negative sf1 candidate "
                      f"volume for {g} ({sec}.{field}={v1}) — counter "
                      f"capture is broken, refusing the ratio",
                      file=sys.stderr)
                return 1
            row["candidates_sf1"] = v1
            row["candidates_sf10"] = v10
            row["step_candidates"] = round(v10 / v1, 2)
            row["step_per_candidate"] = round(
                (t10 / t1) / (v10 / v1), 2)
        table[g] = row
    art = {
        "metric": "same-window sf1->sf10 step (interleaved per gate)",
        "gates": table,
        "note": ("each gate's two sides ran back-to-back in one session, "
                 "fresh quiet-gated JVMs, runs=3 per side (r18 verdict #1/#6); "
                 "step_candidates is the gate's own candidate-volume growth "
                 "from graft.tools.AnnCounters — step_per_candidate ~1 means "
                 "time tracked work exactly"),
    }
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    worst = max((r["step_same_window"], g) for g, r in table.items())
    print(f"[ann_steps] {len(table)} gates -> {out}; worst same-window step: "
          f"{worst[1]} at {worst[0]}x")
    if bad_gates:
        print(f"[ann_steps] ERROR: side(s) with quiet_gate != passed: {bad_gates}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
