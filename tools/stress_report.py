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
    rows = sorted(((q1[k] / max(q01[k], 1e-9), k) for k in q1 if k in q01 and ok(k)),
                  reverse=True)
    over = [r for r in rows if r[0] > 10]
    print(f"\n10x invariant: {len(over)} of {len(rows)} queries over cap")
    for r, k in rows[:8]:
        m = sf1.get("min", {}).get(k)
        print(f"  {r:6.2f}x  {q01[k]:6.2f} -> {q1[k]:6.2f}"
              f" (min {m if m is None else round(m, 2)})  {k}")

    srows = sorted(((qs[k] / max(q1[k], 1e-9), k) for k in qs
                    if k in q1 and q1.get(k, -1) >= 0 and qs.get(k, -1) >= 0),
                   reverse=True)
    print(f"\nskew vs uniform sf1 (same volume): top ratios")
    for r, k in srows[:10]:
        print(f"  {r:6.2f}x  {q1[k]:6.2f} -> {qs[k]:6.2f}  {k}")
    fam = [k for k in qs if k.split("_")[0] in ("dedup", "graph", "mm")
           or k.startswith("corpus_near")]
    worst = max((qs[k] / max(q1.get(k, 1e-9), 1e-9), k) for k in fam)
    print(f"\nrep-collapse families (dedup/graph/mm): worst skew ratio "
          f"{worst[0]:.2f}x ({worst[1]})")

    if prev:
        print("\nprior-round sf1 cap-breakers, re-measured:")
        for k in ("io_stats_prune_scan", "sync_restore_resume", "cass_compact",
                  "q_basket_size_hist"):
            pm = prev["queries"].get(k)
            nm = q1.get(k)
            mn = sf1.get("min", {}).get(k)
            ratio = nm / max(q01.get(k, 1e-9), 1e-9)
            print(f"  {k}: r8 {pm:.2f}s -> r9 {nm:.2f}s"
                  f" (min {mn:.2f}); 10x ratio now {ratio:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
