#!/usr/bin/env python3
"""Dev-only two-run determinism gate: given TWO independent Verify
dump directories (same code, same inputs, separate JVMs), asserts
every query's output is ROW-IDENTICAL — full-row compare with floats
at raw IEEE bit level (stricter than the checker's 9-decimal hash).
Parquet files are not byte-comparable (footer thrift order varies per
JVM), so the contract is row-level, matching the driver's compare.

Usage: determinism_check.py <dumpA> <dumpB> [out.json]
"""
import json, math, struct, sys
import duckdb

a, b = sys.argv[1], sys.argv[2]
out = sys.argv[3] if len(sys.argv) > 3 else None

oracle = json.load(open(f"{a}/oracle_sql.json"))
con = duckdb.connect()

def canon(rows):
    def cell(v):
        if isinstance(v, float):
            if math.isnan(v): return "NaN"
            return "f" + struct.pack("<d", v).hex()
        return str(v)
    return sorted(tuple(cell(v) for v in r) for r in rows)

same, diff, errs = [], [], []
for name in sorted(oracle):
    try:
        ra = con.execute(f"SELECT * FROM read_parquet('{a}/{name}/*.parquet')")
        rows_a, names_a = ra.fetchall(), [d[0] for d in ra.description]
        rb = con.execute(f"SELECT * FROM read_parquet('{b}/{name}/*.parquet')")
        rows_b, names_b = rb.fetchall(), [d[0] for d in rb.description]
    except Exception as e:
        errs.append((name, str(e)[:200])); continue
    if names_a != names_b:
        diff.append((name, "column order/name drift")); continue
    if len(rows_a) != len(rows_b):
        diff.append((name, f"rows {len(rows_a)} vs {len(rows_b)}")); continue
    ca, cb = canon(rows_a), canon(rows_b)
    if ca != cb:
        first = next((i, x, y) for i, (x, y) in enumerate(zip(ca, cb)) if x != y)
        diff.append((name, f"first diff row {first[0]}: {first[1][:150]} vs {first[2][:150]}"))
    else:
        same.append((name, len(rows_a)))

print(f"row-identical: {len(same)}/{len(oracle)}")
for n, d in diff: print(f"DIFF {n}: {d}")
for n, d in errs: print(f"ERR  {n}: {d}")
if out:
    json.dump({"total": len(oracle), "row_identical": len(same),
               "diff": [{"query": n, "detail": d} for n, d in diff],
               "err": [{"query": n, "detail": d} for n, d in errs]},
              open(out, "w"), indent=1)
sys.exit(0 if not diff and not errs else 1)
