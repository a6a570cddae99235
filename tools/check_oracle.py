#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate, DRIVER-STRICT.

The driver reads the Spark result parquet into pandas, runs the oracle
SQL in DuckDB (`.df()`), sorts columns by name, sorts rows, and hashes
VALUES — a comparison that is dtype-sensitive (int64 498 != float64
498.0) and that crashes on array cells. Round 11 shipped five red rows
because this script compared Python tuples (where 498 == 498.0); it now
mirrors the driver:

  1. got  = pandas.read_parquet(<query dir>)      (Spark side)
  2. exp  = duckdb.sql(oracle).df()               (oracle side;
     HUGEINT and DECIMAL become float64 HERE — the r11 trap)
  3. columns sorted by name; rows sorted pandas-style (crashes on
     array cells exactly like the driver's canonicalizer — reported
     as red, not rescued)
  4. dtypes must MATCH and values must be exactly equal

plus static hazard screens that are red even when the compare passes:
  - oracle result types containing HUGEINT, or DECIMAL wider than
    precision 18 (both collapse to float64 and can silently round)
  - Spark output schema containing list/struct/map (driver crash) or
    decimal wider than precision 18
  - integer magnitudes past 2^53 in either side's integer columns
    (float64-exactness boundary — any float path corrupts them)

A failing query also reports whether a values-only (tuple) compare
passes, to distinguish "values wrong" from "representation wrong".

Usage: check_oracle.py <sfdir> <outdir> [--values-only]
"""
import sys, os, json, math
import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pyarrow as pa
import numpy as np

args = [a for a in sys.argv[1:] if not a.startswith("--")]
values_only = "--values-only" in sys.argv
sfdir, outdir = args[0], args[1]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

FLOAT64_EXACT = 2 ** 53


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    return v


def tuple_canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def values_match(got_rows, got_cols, exp_rows, exp_cols):
    """The old (weak) tuple compare — adjudication aid only."""
    if sorted(got_cols) != sorted(exp_cols):
        return False
    if len(got_rows) != len(exp_rows):
        return False
    return tuple_canon(got_rows, got_cols) == tuple_canon(exp_rows, exp_cols)


def spark_schema_hazards(path):
    """Red flags readable from the Spark parquet schema alone."""
    hazards = []
    schema = pq.ParquetDataset(path).schema
    for name, typ in zip(schema.names, schema.types):
        if (pa.types.is_list(typ) or pa.types.is_large_list(typ)
                or pa.types.is_struct(typ) or pa.types.is_map(typ)):
            hazards.append(f"spark col '{name}' is nested ({typ}) — "
                           "driver canonicalizer crashes on array cells")
        if pa.types.is_decimal(typ) and typ.precision > 18:
            hazards.append(f"spark col '{name}' is {typ} — wider than "
                           "DECIMAL(18,x), floats past 2^53 corrupt")
    return hazards


def oracle_type_hazards(rel):
    hazards = []
    for name, typ in zip(rel.columns, rel.types):
        s = str(typ)
        if s == "HUGEINT":
            hazards.append(f"oracle col '{name}' is HUGEINT — becomes "
                           "float64 in pandas, hash-fails vs BIGINT "
                           "(CAST the oracle expression to BIGINT)")
        if s.startswith("DECIMAL"):
            prec = int(s.split("(")[1].split(",")[0])
            if prec > 18:
                hazards.append(f"oracle col '{name}' is {s} — wider than "
                               "DECIMAL(18,x), float64 conversion rounds")
    return hazards


def magnitude_hazards(df, side):
    hazards = []
    for c in df.columns:
        col = df[c]
        if col.dtype.kind in "iu":
            if len(col) and col.abs().max() > FLOAT64_EXACT:
                hazards.append(f"{side} col '{c}' holds integers past "
                               "2^53 — any float path corrupts them")
        elif col.dtype == object:
            for v in col.head(1000):
                if isinstance(v, int) and abs(v) > FLOAT64_EXACT:
                    hazards.append(f"{side} col '{c}' holds Python ints "
                                   "past 2^53")
                    break
    return hazards


def driver_canon(df):
    """Mirror the driver: lowercase+sort columns, sort rows pandas-style.
    Raises (like the driver) on unhashable cells."""
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def strict_compare(got, exp):
    """Dtype + exact-value compare on canonicalized frames.
    Returns (ok, reason)."""
    if list(got.columns) != list(exp.columns):
        return False, (f"COLUMN MISMATCH got={list(got.columns)} "
                       f"exp={list(exp.columns)}")
    if len(got) != len(exp):
        return False, f"ROWCOUNT got={len(got)} exp={len(exp)}"
    for c in got.columns:
        if str(got[c].dtype) != str(exp[c].dtype):
            return False, (f"DTYPE DRIFT col '{c}': spark={got[c].dtype} "
                           f"oracle={exp[c].dtype}")
    for c in got.columns:
        g, e = got[c], exp[c]
        if g.dtype.kind == "f":
            both_nan = g.isna() & e.isna()
            eq = (g == e) | both_nan
        else:
            eq = (g == e) | (g.isna() & e.isna())
        if not bool(eq.all()):
            i = int(np.argmin(eq.values))
            return False, (f"VALUE MISMATCH col '{c}' at sorted-row {i}: "
                           f"got {g.iloc[i]!r} exp {e.iloc[i]!r}")
    return True, None


n_pass = n_fail = 0
for name in sorted(os.listdir(outdir)):
    path = os.path.join(outdir, name)
    if not os.path.isdir(path):
        continue
    if name not in oracle:
        nrows = len(pd.read_parquet(path))
        print(f"  ~ {name}: no oracle (rows={nrows})")
        continue

    problems = []
    try:
        got_df = pd.read_parquet(path)
    except Exception as exc:
        print(f"  ✗ {name}: spark parquet unreadable: {exc}")
        n_fail += 1
        continue
    exp_rel = con.sql(oracle[name])
    if not values_only:
        problems += spark_schema_hazards(path)
        problems += oracle_type_hazards(exp_rel)
    exp_df = exp_rel.df()

    if values_only:
        got_rows = [tuple(r) for r in got_df.itertuples(index=False)]
        exp_rows = [tuple(r) for r in exp_df.itertuples(index=False)]
        ok = values_match(got_rows, [c.lower() for c in got_df.columns],
                          exp_rows, [c.lower() for c in exp_df.columns])
        if ok:
            print(f"  ✓ {name} ({len(got_rows)} rows) [values-only]")
            n_pass += 1
        else:
            print(f"  ✗ {name}: VALUES DIFFER [values-only]")
            n_fail += 1
        continue

    problems += magnitude_hazards(got_df, "spark")
    problems += magnitude_hazards(exp_df, "oracle")

    canon_err = None
    try:
        got_c = driver_canon(got_df)
        exp_c = driver_canon(exp_df)
    except Exception as exc:
        canon_err = f"CANONICALIZER CRASH (driver would err): {exc!r}"
        got_c = exp_c = None

    if canon_err:
        problems.append(canon_err)
        ok, reason = False, canon_err
    else:
        ok, reason = strict_compare(got_c, exp_c)

    if ok and not problems:
        print(f"  ✓ {name} ({len(got_c)} rows)")
        n_pass += 1
    else:
        n_fail += 1
        print(f"  ✗ {name}:" + (f" {reason}" if reason else ""))
        for p in problems:
            if p != reason:
                print(f"      hazard: {p}")
        if reason and reason != canon_err:
            # adjudication aid: do the VALUES at least agree?
            got_rows = [tuple(r) for r in got_df.itertuples(index=False)]
            exp_rows = [tuple(r) for r in exp_df.itertuples(index=False)]
            vm = values_match(got_rows,
                              [c.lower() for c in got_df.columns],
                              exp_rows,
                              [c.lower() for c in exp_df.columns])
            print(f"      (values-only compare: "
                  f"{'PASS — representation defect' if vm else 'FAIL — values wrong'})")

print(f"\n{n_pass} pass, {n_fail} fail, "
      f"{len([n for n in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, n)) and n not in oracle])} oracle-less")
sys.exit(1 if n_fail else 0)
