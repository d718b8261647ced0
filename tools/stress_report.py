#!/usr/bin/env python3
"""Summarize the round's stress artifacts for BENCH_STRESS_r{N}.md:

  stress_report.py SF01.json SF1.json SKEW.json [r8_SF1.json]

- 10x invariant: per-query sf1/sf0.1 ratio (cap 10), worst offenders,
  suite ratio.
- Skew delta: per-query skew/uniform-sf1 ratio (same data volume,
  adversarial distribution), worst offenders.
- Cap-breaker adjudication vs the prior round's sf1 artifact (median
  AND min, since the prior artifact's 2-run medians were disk-noisy).
"""
import json
import sys


def load(p):
    d = json.load(open(p))
    return d


def main() -> int:
    sf01, sf1, skew = (load(p) for p in sys.argv[1:4])
    prev = load(sys.argv[4]) if len(sys.argv) > 4 else None
    q01, q1, qs = sf01["queries"], sf1["queries"], skew["queries"]
    print(f"suite: sf0.1 {sf01['value']:.1f}s ({sf01['runs_per_query']} runs)"
          f" | sf1 {sf1['value']:.1f}s ({sf1['runs_per_query']} runs)"
          f" | skew {skew['value']:.1f}s ({skew['runs_per_query']} runs)")
    print(f"suite 10x ratio: {sf1['value'] / sf01['value']:.2f}x"
          f" | skew/uniform: {skew['value'] / sf1['value']:.2f}x")

    # a failed query carries the -1.0 sentinel median: it must be
    # reported as a FAILURE, never fed into a ratio (a failure at
    # sf0.1 would otherwise top the cap-breaker list at ~1e9x, and a
    # failure at sf1 would hide as a negative ratio)
    failed = sorted(k for k in set(q01) | set(q1) | set(qs)
                    if min(q01.get(k, 0), q1.get(k, 0), qs.get(k, 0)) < 0)
    if failed:
        print(f"\nFAILED queries (excluded from every ratio): {', '.join(failed)}")
    ok = lambda k: q01.get(k, -1) >= 0 and q1.get(k, -1) >= 0
    # adjudicate on MIN alongside median: a single polluted run can
    # double a 3-run median (r10: dedup_minhash_calibration skew
    # median 24.1 s vs min 11.1 s), so a cap-breaker is only REAL if
    # it breaks on both. min-of-N is the contention-free estimate;
    # median catches bimodal/GC-bound shapes the min hides.
    m01, m1, ms = (a.get("min", {}) for a in (sf01, sf1, skew))

    def both_ratios(k, small_med, big_med, small_min, big_min):
        med = big_med[k] / max(small_med[k], 1e-9)
        mn = (big_min[k] / max(small_min[k], 1e-9)
              if k in small_min and k in big_min and small_min[k] > 0 else med)
        return med, mn

    rows = sorted(((both_ratios(k, q01, q1, m01, m1), k)
                   for k in q1 if k in q01 and ok(k)), reverse=True)
    over_med = [r for r in rows if r[0][0] > 10]
    over_both = [r for r in rows if r[0][0] > 10 and r[0][1] > 10]
    print(f"\n10x invariant: {len(over_med)} of {len(rows)} over cap by median, "
          f"{len(over_both)} CONFIRMED by min (the adjudicated count)")
    for (rm, rn), k in rows[:8]:
        print(f"  med {rm:6.2f}x / min {rn:6.2f}x  "
              f"{q01[k]:6.2f} -> {q1[k]:6.2f} (min {round(m1.get(k, -1), 2)})  {k}")

    srows = sorted(((both_ratios(k, q1, qs, m1, ms), k) for k in qs
                    if k in q1 and q1.get(k, -1) >= 0 and qs.get(k, -1) >= 0),
                   reverse=True)
    print(f"\nskew vs uniform sf1 (same volume): top ratios (median / min)")
    for (rm, rn), k in srows[:10]:
        print(f"  med {rm:6.2f}x / min {rn:6.2f}x  {q1[k]:6.2f} -> {qs[k]:6.2f}  {k}")
    fam = [k for k in qs if k.split("_")[0] in ("dedup", "graph", "mm")
           or k.startswith("corpus_near")]
    worst = max((qs[k] / max(q1.get(k, 1e-9), 1e-9), k) for k in fam)
    print(f"\nrep-collapse families (dedup/graph/mm): worst skew ratio "
          f"{worst[0]:.2f}x ({worst[1]})")

    if prev:
        # round-over-round sf1 movers: every query >1.2x slower than
        # the prior round's artifact by median, with min shown so a
        # polluted-median mover is visibly distinguishable from a
        # real plan regression
        pq, pmin = prev["queries"], prev.get("min", {})
        movers = sorted(((q1[k] / max(pq[k], 1e-9), k) for k in q1
                         if k in pq and pq[k] > 0 and q1[k] > 0
                         and q1[k] / pq[k] > 1.2), reverse=True)
        common = [k for k in q1 if k in pq and pq[k] > 0 and q1[k] > 0]
        tot_now = sum(q1[k] for k in common)
        tot_prev = sum(pq[k] for k in common)
        print(f"\nvs prior-round sf1 ({len(common)} common queries): "
              f"{tot_now:.1f}s vs {tot_prev:.1f}s ({tot_now / tot_prev:.2f}x); "
              f"{len(movers)} queries >1.2x slower:")
        for r, k in movers:
            mn_now = m1.get(k)
            mn_prev = pmin.get(k)
            mr = (f"{mn_now / mn_prev:.2f}x"
                  if mn_now and mn_prev and mn_prev > 0 else "n/a")
            print(f"  med {r:5.2f}x / min {mr:>6}  "
                  f"{pq[k]:6.2f} -> {q1[k]:6.2f}  {k}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
