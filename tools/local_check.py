#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate: reads the Verify
dump (parquet per query + oracle_sql.json), runs each oracle in DuckDB
against the same testdata parquet, and compares row counts, schemas
(column names), and value hashes (columns sorted by name, rows sorted).
Not shipped library code — the engine itself is pure Scala/Spark.
"""
import json, sys, math
import duckdb

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(rows, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = repr(round(v, 9))
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return out

fails, passes = [], []
for name, sql in sorted(oracle.items()):
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        got_rows, got_names = got.fetchall(), [d[0] for d in got.description]
    except Exception as e:
        fails.append((name, f"spark output unreadable: {e}")); continue
    try:
        exp = con.execute(sql)
        exp_rows, exp_names = exp.fetchall(), [d[0] for d in exp.description]
    except Exception as e:
        fails.append((name, f"oracle failed: {e}")); continue
    if sorted(got_names) != sorted(exp_names):
        fails.append((name, f"schema: spark={sorted(got_names)} oracle={sorted(exp_names)}")); continue
    if len(got_rows) != len(exp_rows):
        fails.append((name, f"rows: spark={len(got_rows)} oracle={len(exp_rows)}")); continue
    g, e = canon(got_rows, got_names), canon(exp_rows, exp_names)
    if g != e:
        diff = next((i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b)
        fails.append((name, f"hash: first diff row {diff[0]}:\n  spark : {diff[1][:300]}\n  oracle: {diff[2][:300]}"))
    else:
        passes.append((name, len(got_rows)))

for n, c in passes: print(f"PASS {n} ({c} rows)")
for n, m in fails: print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} pass / {len(fails)} fail")
sys.exit(1 if fails else 0)
