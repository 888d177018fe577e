#!/usr/bin/env python3
"""Auto-adjudication for the big-SF bench lane (r17 verdict #3).

Two rounds running, the sf10 lane's contended numerator (the lane's own
32-thread saturation puts in-run loads at 14-17) manufactured an
over-linear headline step (y3: 12.9x r16, 10.1x r17) that a MANUAL
quiet isolated rerun then retracted (7.2x, 6.74x). This tool automates
the retraction: given the lane capture and a quiet denominator (the
pair-of-record sf1 side), it lists the gates whose 10x step exceeds the
threshold so the lane script can re-run each ALONE in a fresh
quiet-gated JVM, then merges those isolated numbers into the artifact
of record with explicit per-gate `adjudicated` fields — SCALE.md needs
no hand-written correction.

Usage:
  sf10_adjudicate.py list  <laneJson> <denomJson> <threshold>
      -> prints the names of gates with step > threshold (one per line)
  sf10_adjudicate.py merge <laneJson> <denomJson> <threshold> <outJson> <adjPrefix>
      -> writes <outJson>: lane artifact + adjudicated values + per-gate
         step bookkeeping; isolated reruns read from <adjPrefix><gate>.json
"""
import sys, json, os


def steps(lane, denom, thr):
    flagged, table, undenominated = [], {}, []
    for q, t in lane["queries"].items():
        d = denom["queries"].get(q)
        if d is None or d <= 0 or t <= 0:
            # a lane gate with no positive denominator would be silently
            # exempt from adjudication AND the worst-step report — the
            # 'silent shrink' class (r18 advice): a gate newly added to
            # the lane but run against a stale denominator artifact must
            # fail loudly, not table step_lane=None
            table[q] = {"lane": t, "denom": d, "step_lane": None}
            undenominated.append(q)
            continue
        step = t / d
        table[q] = {"lane": t, "denom": d, "step_lane": round(step, 2)}
        if step > thr:
            flagged.append(q)
    if undenominated:
        raise SystemExit(
            f"[adjudicate] ERROR: lane gate(s) without a positive denominator "
            f"entry in the denom artifact: {sorted(undenominated)} — the "
            f"denominator is stale or the gate failed; refusing to adjudicate")
    return flagged, table


def main():
    mode = sys.argv[1]
    lane = json.load(open(sys.argv[2]))
    denom = json.load(open(sys.argv[3]))
    thr = float(sys.argv[4])
    flagged, table = steps(lane, denom, thr)
    if mode == "list":
        for q in sorted(flagged):
            print(q)
        return 0
    assert mode == "merge", f"unknown mode {mode}"
    out_json, adj_prefix = sys.argv[5], sys.argv[6]
    final = dict(lane["queries"])
    for q in flagged:
        path = f"{adj_prefix}{q}.json"
        if not os.path.exists(path):
            table[q]["adjudicated"] = "MISSING_RERUN"
            continue
        iso = json.load(open(path))
        it = iso["queries"][q]
        table[q]["isolated"] = it
        table[q]["step_isolated"] = round(it / table[q]["denom"], 2)
        gate = iso.get("env", {}).get("quiet_gate")
        table[q]["isolated_quiet_gate"] = gate
        if gate != "passed":
            # an isolated rerun whose own quiet gate stamped timeout/waived
            # is exactly the contended-numerator-of-record failure this
            # lane exists to prevent (r16/r17 verdicts) — keep the lane
            # number, flag the gate, and fail the merge (r18 advice)
            table[q]["adjudicated"] = "CONTENDED_RERUN"
            continue
        table[q]["adjudicated"] = True
        final[q] = it  # the isolated quiet number is the number of record
    art = {
        "metric": "total", "value": sum(final.values()), "unit": "sec",
        "queries": final,
        # per-gate in-JVM median-of-N convention rides through to the
        # artifact of record (r18 verdict #6: ANN gates must stamp runs>=3)
        "runs": lane.get("runs"),
        "adjudication_threshold": thr,
        "adjudicated": {q: table[q] for q in sorted(table)},
        "lane_raw_total": lane["value"],
        "denom": sys.argv[3],
        "sf": lane.get("sf"),
        "env": lane.get("env"),
        "note": ("per-gate step vs the quiet denominator; gates whose lane "
                 "step exceeded the threshold carry an isolated quiet-JVM "
                 "rerun as their number of record (r17 verdict #3)"),
    }
    with open(out_json, "w") as f:
        json.dump(art, f, indent=1)
    adj = [q for q in flagged if table[q].get("adjudicated") is True]
    missing = [q for q in flagged if table[q].get("adjudicated") == "MISSING_RERUN"]
    contended = [q for q in flagged if table[q].get("adjudicated") == "CONTENDED_RERUN"]
    print(f"[adjudicate] {len(adj)} gate(s) adjudicated: {adj or 'none'}")
    if missing:
        print(f"[adjudicate] ERROR: flagged but no isolated rerun found: {missing}")
        return 1
    if contended:
        print(f"[adjudicate] ERROR: isolated rerun(s) with quiet_gate != passed "
              f"(contended numerator, not a number of record): {contended}")
        return 1
    worst = max((v["step_isolated" if v.get("adjudicated") is True else "step_lane"], q)
                for q, v in table.items()
                if v.get("step_lane") is not None)
    print(f"[adjudicate] worst final step: {worst[1]} at {worst[0]}x -> {out_json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
