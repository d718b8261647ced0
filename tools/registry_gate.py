#!/usr/bin/env python3
"""Registry-freeze gate (VERDICT r14 #3): every per-round artifact must
cover EXACTLY the frozen registry — an operator that lands after the
battery ran must fail the round loudly instead of silently shipping
unmeasured (r14: 9 ops bypassed the bench legs, 4 bypassed determinism
and the plan snapshot entirely).

Checks, for round N:
  1. the Verify dump's per-query dirs == its oracle_sql.json keys
     (the queries/oracleSql 1:1 contract),
  2. DETERMINISM_rN.json: total == registry, row_identical == total,
     err == 0,
  3. PLANS_rN.md: one audited plan per registry key (names compared),
  4. every BENCH_*_rN.json present: per-query keys == registry and no
     errored queries,
  5. CORRECTNESS_rN.json (when the driver artifact exists): keys ==
     registry.

Usage: registry_gate.py <round-number> <verify_dump_dir> [repo_root]
Exit 0 = frozen and fully covered; 1 = any gap (each printed).
"""
import glob, json, os, sys

rnd = sys.argv[1]
dump = sys.argv[2]
root = sys.argv[3] if len(sys.argv) > 3 else "."

fails = []

def clip(xs, n=15):
    xs = sorted(xs)
    return xs[:n] + [f"...+{len(xs) - n} more"] if len(xs) > n else xs

def check(label, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'} {label}" + (f": {detail}" if detail else ""))
    if not ok:
        fails.append(label)

oracle = set(json.load(open(os.path.join(dump, "oracle_sql.json"))))
dirs = {d for d in os.listdir(dump)
        if os.path.isdir(os.path.join(dump, d))}
check("queries==oracleSql (dump dirs vs oracle keys)", dirs == oracle,
      f"dirs-only={clip(dirs - oracle)} oracle-only={clip(oracle - dirs)}"
      if dirs != oracle else f"{len(oracle)} keys")
registry = oracle
n = len(registry)

det_path = os.path.join(root, f"DETERMINISM_r{rnd}.json")
if os.path.exists(det_path):
    det = json.load(open(det_path))
    check(f"DETERMINISM_r{rnd} cardinality", det.get("total") == n,
          f"total={det.get('total')} vs registry={n}")
    check(f"DETERMINISM_r{rnd} clean",
          det.get("row_identical") == det.get("total") and not det.get("err"),
          f"row_identical={det.get('row_identical')} err={det.get('err')}")
else:
    check(f"DETERMINISM_r{rnd} exists", False, det_path)

plans_path = os.path.join(root, f"PLANS_r{rnd}.md")
if os.path.exists(plans_path):
    names = set()
    for line in open(plans_path):
        tok = line.split()
        if tok and tok[0] in registry:
            names.add(tok[0])
    check(f"PLANS_r{rnd} coverage", names == registry,
          f"missing={clip(registry - names)}" if names != registry else f"{len(names)} plans")
else:
    check(f"PLANS_r{rnd} exists", False, plans_path)

bench_files = sorted(glob.glob(os.path.join(root, f"BENCH_*_r{rnd}.json")))
check(f"bench legs present (r{rnd})", len(bench_files) >= 4,
      f"found {[os.path.basename(b) for b in bench_files]} (want sf0.1, sf1, skew, 30x)")
for b in bench_files:
    base = os.path.basename(b)
    try:
        data = json.load(open(b))
        qs = set(data.get("queries", {}))
        errs = data.get("errors", [])
        if "SINGLES" in base:
            # adjudication singles are a subset by design; only their
            # members must be registry keys and error-free
            check(f"{base} subset-of-registry", qs <= registry,
                  f"extra={clip(qs - registry)}" if not qs <= registry
                  else f"{len(qs)} singles")
        else:
            check(f"{base} coverage", qs == registry,
                  f"missing={clip(registry - qs)} extra={clip(qs - registry)}"
                  if qs != registry else f"{len(qs)} queries")
        check(f"{base} no errors", errs == [], str(errs))
    except Exception as e:  # malformed artifact is a gate failure, not a crash
        check(f"{base} parse", False, str(e))

corr_path = os.path.join(root, f"CORRECTNESS_r{rnd}.json")
if os.path.exists(corr_path):
    corr = set(json.load(open(corr_path)))
    check(f"CORRECTNESS_r{rnd} coverage", corr == registry,
          f"missing={clip(registry - corr)} extra={clip(corr - registry)}"
          if corr != registry else f"{len(corr)} keys")
else:
    print(f"SKIP CORRECTNESS_r{rnd} (driver artifact not present yet)")

print(f"\nregistry_gate: {'FROZEN-AND-COVERED' if not fails else 'GAPS'} "
      f"(registry={n}, failures={len(fails)})")
sys.exit(1 if fails else 0)
