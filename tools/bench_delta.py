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

Usage: tools/bench_delta.py OLD_bench_full.json NEW_bench_full.json [out.json]
"""
import json
import sys

RATIO = 1.4
ABS_S = 1.0


def rows(path):
    d = json.load(open(path))
    if "rows" in d:
        return {q: (v["sec"], bool(v["warm"])) for q, v in d["rows"].items()}
    # pre-round-10 snapshot: no per-row warm attribution — treat every
    # row as cold and let the caller know the split is unavailable
    warm = set(d.get("warm", []))
    return {q: (v, q in warm) for q, v in d.get("queries", {}).items()}


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    old, new = rows(old_path), rows(new_path)
    true_deltas, warm_shifted, improved = {}, {}, {}
    for q in sorted(set(old) & set(new)):
        (o, ow), (n, nw) = old[q], new[q]
        entry = {"old": o, "new": n, "ratio": round(n / o, 2) if o else None,
                 "old_warm": ow, "new_warm": nw}
        if n > o * RATIO and n - o > ABS_S:
            (warm_shifted if ow != nw else true_deltas)[q] = entry
        elif o > n * RATIO and o - n > ABS_S:
            improved[q] = entry
    out = {
        "old": old_path, "new": new_path,
        "flag_rule": f">{RATIO}x and >{ABS_S}s",
        "note": "warm_shifted rows changed memo attribution between runs "
                "(cache artifact, excluded from adjudication); true_deltas "
                "need the fresh-battery adjudication protocol",
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
