#!/usr/bin/env python3
"""Compare two Bench JSON artifacts (e.g. sf0.1 vs sf1) and flag
super-linear queries: at a 10x data scale-up, anything slower than
RATIO_CAP x its small-SF time is a scale-shape suspect.

Usage: bench_compare.py SMALL.json BIG.json [ratio_cap=10]
"""
import json
import sys


def main() -> int:
    small = json.load(open(sys.argv[1]))["queries"]
    big = json.load(open(sys.argv[2]))["queries"]
    cap = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    rows = []
    for k, tb in big.items():
        ts = small.get(k)
        if ts is None:
            continue
        # Subtract nothing: fixed per-query session overhead inflates the
        # small-SF denominator, so the raw ratio UNDERSTATES scaling —
        # a ratio beyond cap is a real super-linear signal.
        rows.append((tb / max(ts, 1e-9), ts, tb, k))
    rows.sort(reverse=True)
    bad = [r for r in rows if r[0] > cap]
    print(f"{len(rows)} shared queries; cap {cap}x; {len(bad)} over cap")
    print(f"{'ratio':>7} {'small_s':>8} {'big_s':>8}  query")
    for ratio, ts, tb, k in rows[:25]:
        flag = " <== OVER CAP" if ratio > cap else ""
        print(f"{ratio:7.2f} {ts:8.2f} {tb:8.2f}  {k}{flag}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
