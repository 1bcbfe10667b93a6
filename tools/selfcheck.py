#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/selfcheck.py [verify_out_dir] [sf_dir]

Reads the parquet results Verify.scala dumped per query, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same testdata tables,
sorts columns by name and rows by all columns, and compares values exactly
(with a tiny float report if not bit-equal).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


n_pass = n_fail = 0
queries = sorted(os.listdir(OUT))
for name in queries:
    qdir = os.path.join(OUT, name)
    if not os.path.isdir(qdir):
        continue
    files = glob.glob(f"{qdir}/*.parquet")
    if not files:
        print(f"FAIL  {name}: no spark output")
        n_fail += 1
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    if name not in oracle:
        print(f"ROWS  {name}: rows={len(spark_df)} (no oracle)")
        continue
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL  {name}: oracle SQL error: {e}")
        n_fail += 1
        continue
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        print(f"FAIL  {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
        n_fail += 1
        continue
    if len(a) != len(b):
        print(f"FAIL  {name}: rowcount spark={len(a)} duck={len(b)}")
        n_fail += 1
        continue
    ok = True
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
            if not eq.all():
                bad = ~eq
                md = np.nanmax(np.abs(av[bad] - bv[bad]))
                print(f"FAIL  {name}: col {c}: {bad.sum()}/{len(av)} differ, maxdiff={md:.3e}")
                ok = False
        else:
            try:
                eq = (av == bv) | (pd.isna(av) & pd.isna(bv))
            except Exception:
                eq = np.array([x == y or (pd.isna(x) and pd.isna(y)) for x, y in zip(av, bv)])
            if not np.all(eq):
                i = int(np.argmax(~np.asarray(eq)))
                print(f"FAIL  {name}: col {c}: {int((~np.asarray(eq)).sum())}/{len(av)} differ, e.g. {av[i]!r} vs {bv[i]!r}")
                ok = False
    if ok:
        print(f"PASS  {name} ({len(a)} rows)")
        n_pass += 1
    else:
        n_fail += 1

print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} oracles")
sys.exit(1 if n_fail else 0)
