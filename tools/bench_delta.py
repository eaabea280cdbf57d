#!/usr/bin/env python3
"""Classify per-query bench deltas between two bench_full.json snapshots.

The round-over-round adjudication convention flags rows that slowed by
more than RATIO x and more than ABS_S seconds. Since round 10 the bench
writes per-row {sec, warm} attribution, so a delta whose warm status
CHANGED between the two runs (a session-memo hit on one side but not the
other) is a cache-attribution shift, not an engine regression — those
rows land in "warm_shifted" and stay OUT of the adjudication list.
Rows flagged in both directions of warmth land in "true_deltas" and
follow the usual fresh-battery adjudication protocol (BENCH_adjudicate_*).

Since round 15 the bench embeds CONTROLS — three stable queries re-run
at battery start/middle/end. When both snapshots carry them, the median
new/old ratio over the control runs estimates THIS comparison's
box-contention inflation, the new-side times are deflated by it before
flagging, and the factor is reported as "control_inflation" — so a
uniformly contended battery no longer floods the list with phantom
regressions (the round-14 adjudication problem).

Since round 16 the bench also embeds one HEAVY control
("heavy_sortagg" — a multi-exchange, spill-class sort+agg), because the
light trio is all ~1 s single-shuffle rows and cannot see memory/GC
pressure that squeezes only big-shuffle rows (the r15 driver battery:
light controls quiet while q220 read 13x). When both snapshots carry
it, rows whose OLD-side time is >= HEAVY_T seconds are normalized by
the heavy-control ratio ("control_inflation_heavy") and lighter rows by
the light median; with no heavy control on either side every row falls
back to the light median as before.

Usage: tools/bench_delta.py OLD_bench_full.json NEW_bench_full.json [out.json]
"""
import json
import statistics
import sys

RATIO = 1.4
ABS_S = 1.0
HEAVY_T = 3.0  # old-side seconds at/above which the heavy scale applies


def load(path):
    return json.load(open(path))


def rows(d):
    if "rows" in d:
        return {q: (v["sec"], bool(v["warm"])) for q, v in d["rows"].items()}
    # pre-round-10 snapshot: no per-row warm attribution — treat every
    # row as cold and let the caller know the split is unavailable
    warm = set(d.get("warm", []))
    return {q: (v, q in warm) for q, v in d.get("queries", {}).items()}


def control_inflation(old_d, new_d, heavy=False):
    """Median new/old ratio over matching (position, control) runs of the
    requested weight class, or None when either snapshot lacks them."""
    oc, nc = old_d.get("controls") or {}, new_d.get("controls") or {}
    ratios = []
    for tag in oc:
        for q, ov in (oc[tag] or {}).items():
            if (q == "heavy_sortagg") != heavy:
                continue
            nv = (nc.get(tag) or {}).get(q)
            if nv is not None and ov > 0:
                ratios.append(nv / ov)
    return round(statistics.median(ratios), 3) if ratios else None


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    old_d, new_d = load(old_path), load(new_path)
    old, new = rows(old_d), rows(new_d)
    inflation = control_inflation(old_d, new_d)
    heavy_inflation = control_inflation(old_d, new_d, heavy=True)
    # SYMMETRIC normalization: inflation estimates h_new/h_old (the two
    # boxes' contention ratio), so dividing the new side by it makes
    # the sides comparable in BOTH directions — > 1 deflates a hot new
    # battery (no phantom regressions), < 1 inflates a calm new battery
    # back to the hot old baseline (a real regression the old side's
    # contention would otherwise mask, and no phantom 'improved' flood)
    light_scale = inflation if inflation else 1.0
    heavy_scale = heavy_inflation if heavy_inflation else light_scale
    true_deltas, warm_shifted, improved = {}, {}, {}
    for q in sorted(set(old) & set(new)):
        (o, ow), (n, nw) = old[q], new[q]
        scale = heavy_scale if o >= HEAVY_T else light_scale
        adj = n / scale
        entry = {"old": o, "new": n, "ratio": round(n / o, 2) if o else None,
                 "adj_new": round(adj, 3),
                 "adj_ratio": round(adj / o, 2) if o else None,
                 "old_warm": ow, "new_warm": nw}
        if adj > o * RATIO and adj - o > ABS_S:
            (warm_shifted if ow != nw else true_deltas)[q] = entry
        elif o > adj * RATIO and o - adj > ABS_S:
            improved[q] = entry
    out = {
        "old": old_path, "new": new_path,
        "flag_rule": f">{RATIO}x and >{ABS_S}s after control deflation",
        "control_inflation": inflation,
        "control_inflation_heavy": heavy_inflation,
        "heavy_threshold_s": HEAVY_T,
        "note": "warm_shifted rows changed memo attribution between runs "
                "(cache artifact, excluded from adjudication); true_deltas "
                "need the fresh-battery adjudication protocol; new-side "
                "times were divided by control_inflation (heavy rows — "
                "old >= heavy_threshold_s — by control_inflation_heavy "
                "when both snapshots carry the heavy control) in both "
                "directions before flagging",
        "true_deltas": true_deltas,
        "warm_shifted": warm_shifted,
        "improved": improved,
    }
    text = json.dumps(out, indent=1)
    if len(sys.argv) > 3:
        open(sys.argv[3], "w").write(text)
    print(text)


if __name__ == "__main__":
    main()
