#!/usr/bin/env python3
"""Dev-only float-parity audit: compares every double column of the
Verify dump BIT-FOR-BIT (raw IEEE-754 bits, not the checker's
9-decimal hash) against the DuckDB oracle. Output classifies each
query:

  BITEXACT  — every float matches bit-for-bit. Any final-select
              round() on such a query is pure display and is a
              PARITY HAZARD (Spark rounds the shortest decimal repr
              HALF_UP; DuckDB rounds the binary value — they disagree
              whenever the shortest repr ends in 5 at the target
              scale). Emit unrounded instead.
  DRIFT     — floats agree at the 9-decimal checker precision but not
              bit-for-bit. The round() is a load-bearing drift
              absorber; keep it, and keep the value class away from
              .xxxx5 attractors (no exact-cents/n means).
  MISMATCH  — disagree even at checker precision (a real bug).

Rows are paired by sorting on ALL columns, with float columns entering
the key at the checker's 9-decimal precision (so sub-ulp drift cannot
reorder the pairing; rows that tie on every non-float column AND on
all floats at 9 decimals may still pair bitexact-vs-drift variants
against each other — that worst case misclassifies drift as bitexact,
never produces a false MISMATCH).
"""
import json, math, struct, sys
import duckdb

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def bits(v):
    return struct.unpack("<Q", struct.pack("<d", v))[0]

def keyed(rows, float_idx):
    def k(r):
        out = []
        for i, v in enumerate(r):
            if i in float_idx:
                if v is None: out.append("N")
                elif isinstance(v, float) and math.isnan(v): out.append("NaN")
                else: out.append(repr(round(v, 9)))
            else:
                out.append(str(v))
        return tuple(out)
    return sorted(rows, key=k)

bitexact, drift, mismatch, nofloat, errs = [], [], [], [], []
for name, sql in sorted(oracle.items()):
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        got_rows, got_names = got.fetchall(), [d[0] for d in got.description]
        exp = con.execute(sql)
        exp_rows, exp_names = exp.fetchall(), [d[0] for d in exp.description]
    except Exception as e:
        errs.append((name, str(e)[:200])); continue
    order_g = sorted(range(len(got_names)), key=lambda i: got_names[i])
    order_e = sorted(range(len(exp_names)), key=lambda i: exp_names[i])
    if sorted(got_names) != sorted(exp_names) or len(got_rows) != len(exp_rows):
        errs.append((name, "schema/rows differ (run local_check)")); continue
    g = [[r[i] for i in order_g] for r in got_rows]
    e = [[r[i] for i in order_e] for r in exp_rows]
    float_idx = {i for row in g + e for i, v in enumerate(row)
                 if isinstance(v, float)}
    if not float_idx:
        nofloat.append(name); continue
    g, e = keyed(g, float_idx), keyed(e, float_idx)
    worst = "bitexact"; detail = ""
    for rg, re_ in zip(g, e):
        for i in float_idx:
            a, b = rg[i], re_[i]
            if a is None and b is None: continue
            if (a is None) != (b is None):
                worst = "mismatch"; detail = f"null vs {a if a is not None else b}"; break
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b): continue
                if bits(a) != bits(b):
                    ra = "NaN" if math.isnan(a) else repr(round(a, 9))
                    rb = "NaN" if math.isnan(b) else repr(round(b, 9))
                    if ra != rb:
                        worst = "mismatch"; detail = f"{a!r} vs {b!r}"; break
                    if worst == "bitexact":
                        worst = "drift"; detail = f"{a!r} vs {b!r} (ulp)"
        if worst == "mismatch": break
    {"bitexact": bitexact, "drift": drift,
     "mismatch": mismatch}[worst].append((name, detail))

print(f"== BITEXACT ({len(bitexact)}) — floats match bit-for-bit; "
      f"final round() here is a parity hazard, emit unrounded ==")
for n, _ in bitexact: print(f"  {n}")
print(f"\n== DRIFT ({len(drift)}) — checker-equal, not bit-equal; "
      f"round() is load-bearing ==")
for n, d in drift: print(f"  {n}: {d}")
print(f"\n== MISMATCH ({len(mismatch)}) ==")
for n, d in mismatch: print(f"  {n}: {d}")
print(f"\n== NO FLOAT COLS ({len(nofloat)}) ==")
print("  " + " ".join(nofloat))
if errs:
    print(f"\n== ERRORS ({len(errs)}) ==")
    for n, d in errs: print(f"  {n}: {d}")
