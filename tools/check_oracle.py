#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query
result parquet under OUTDIR, run the matching oracle SQL in DuckDB over
the SFDIR tables, sort columns by name, sort rows, and compare.

Usage: check_oracle.py <sfdir> <outdir>
"""
import sys, os, json, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    return v

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    return sorted(out, key=repr), [cols[i] for i in order]

n_pass = n_fail = 0
for name in sorted(os.listdir(outdir)):
    path = os.path.join(outdir, name)
    if not os.path.isdir(path):
        continue
    got_rel = con.sql(f"SELECT * FROM read_parquet('{path}/*.parquet')")
    got_cols = [c.lower() for c in got_rel.columns]
    got_rows = got_rel.fetchall()
    if name not in oracle:
        print(f"  ~ {name}: no oracle (rows={len(got_rows)})")
        continue
    exp_rel = con.sql(oracle[name])
    exp_cols = [c.lower() for c in exp_rel.columns]
    exp_rows = exp_rel.fetchall()
    g_rows, g_cols = canon(got_rows, got_cols)
    e_rows, e_cols = canon(exp_rows, exp_cols)
    if g_cols != e_cols:
        print(f"  ✗ {name}: COLUMN MISMATCH got={g_cols} exp={e_cols}")
        n_fail += 1
        continue
    if len(g_rows) != len(e_rows):
        print(f"  ✗ {name}: ROWCOUNT got={len(g_rows)} exp={len(e_rows)}")
        n_fail += 1
        continue
    bad = None
    for i, (g, e) in enumerate(zip(g_rows, e_rows)):
        if g != e:
            # allow tiny float wobble report, but still flag
            bad = (i, g, e)
            break
    if bad:
        i, g, e = bad
        print(f"  ✗ {name}: VALUE MISMATCH at sorted-row {i}")
        print(f"      cols {g_cols}")
        print(f"      got {g}")
        print(f"      exp {e}")
        n_fail += 1
    else:
        print(f"  ✓ {name} ({len(g_rows)} rows)")
        n_pass += 1

print(f"\n{n_pass} pass, {n_fail} fail, "
      f"{len([n for n in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, n)) and n not in oracle])} oracle-less")
sys.exit(1 if n_fail else 0)
