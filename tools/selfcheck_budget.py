#!/usr/bin/env python3
"""tools/selfcheck.py with a per-oracle wall budget — for driving the
DuckDB comparison ABOVE the gate scale (sf1), where a handful of oracles
(the 81-point bootstrap fans replayed via LATERAL unnest) are legitimately
much slower in DuckDB than the engine is in Spark. A query whose ORACLE
exceeds the budget is reported `SLOW` (evidence not attempted), never
conflated with a mismatch.

Usage: python3 tools/selfcheck_budget.py [verify_out_dir] [sf_dir] [budget_sec]
           [ledger_json] [only_csv]

`only_csv` (or env SELFCHECK_ONLY) restricts the run to a comma-separated
query-name list — the re-drive path for the heavy oracles that need a
bigger budget than the drain pass.
"""
import sys, os, json, glob, signal
import duckdb
import pandas as pd

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_sf1"
SF = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
BUDGET = int(sys.argv[3]) if len(sys.argv) > 3 else 300
LEDGER = sys.argv[4] if len(sys.argv) > 4 else None
ONLY = None
_only = sys.argv[5] if len(sys.argv) > 5 else os.environ.get("SELFCHECK_ONLY")
if _only:
    ONLY = set(x for x in _only.split(",") if x)
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
                    if os.path.isdir(p) else
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

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


class Timeout(Exception):
    pass


def alarm(_sig, _frm):
    raise Timeout()


signal.signal(signal.SIGALRM, alarm)

n_pass = n_fail = n_slow = 0
ledger = {}
def rec(name, **kw):
    row = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None, "slow": False}
    row.update(kw)
    ledger[name] = row
for name in sorted(os.listdir(OUT)):
    qdir = os.path.join(OUT, name)
    if not os.path.isdir(qdir):
        continue
    if ONLY is not None and name not in ONLY:
        continue
    files = glob.glob(f"{qdir}/*.parquet")
    if not files:
        print(f"FAIL  {name}: no spark output")
        rec(name, err="no spark output")
        n_fail += 1
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    if name not in oracle:
        print(f"ROWS  {name}: rows={len(spark_df)} (no oracle)")
        rec(name, spark_rows=len(spark_df), err="no oracle")
        continue
    def reconnect():
        # a fresh connection after ANY oracle abort: an interrupted or
        # errored query must not leak state into the next comparison
        c = duckdb.connect()
        for t in TABLES:
            p = f"{SF}/{t}.parquet"
            if os.path.exists(p):
                c.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
                    if os.path.isdir(p) else
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        return c

    # the alarm can land while control is inside DuckDB's C++ core, which
    # converts the pending interrupt into its own error instead of letting
    # our Timeout propagate (duckdb 1.0 raises a bare
    # RuntimeError("Query interrupted")) — both are the budget firing,
    # neither is a mismatch
    signal.alarm(BUDGET)
    try:
        duck_df = con.execute(oracle[name]).df()
        signal.alarm(0)
    except Exception as e:
        signal.alarm(0)
        slow = isinstance(e, (Timeout, duckdb.InterruptException)) or \
            "interrupted" in str(e).lower()
        if slow:
            print(f"SLOW  {name}: oracle exceeded {BUDGET}s in DuckDB (not compared)")
            rec(name, spark_rows=len(spark_df), slow=True, err=f"oracle exceeded {BUDGET}s")
            n_slow += 1
        else:
            print(f"FAIL  {name}: oracle error {e}")
            rec(name, spark_rows=len(spark_df), err=f"oracle error: {e}")
            n_fail += 1
        con = reconnect()
        continue
    a, b = norm(spark_df), norm(duck_df)
    schema_ok = list(a.columns) == list(b.columns)
    if not schema_ok:
        print(f"FAIL  {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
        rec(name, rows_match=len(a) == len(b), schema_match=False,
            hash_match=False, spark_rows=len(a), oracle_rows=len(b))
        n_fail += 1
        continue
    if len(a) != len(b):
        print(f"FAIL  {name}: rowcount spark={len(a)} duck={len(b)}")
        rec(name, rows_match=False, schema_match=True, hash_match=False,
            spark_rows=len(a), oracle_rows=len(b))
        n_fail += 1
        continue
    ok = True
    for c in a.columns:
        if c not in b.columns:
            print(f"FAIL  {name}: col {c} missing in oracle")
            ok = False
            break
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            import numpy as np
            eq = (av.values == bv.values) | (pd.isna(av.values) & pd.isna(bv.values))
            if not eq.all():
                d = np.nanmax(np.abs(av.values - bv.values))
                print(f"FAIL  {name}: col {c}: {int((~eq).sum())}/{len(a)} differ, max |Δ| {d}")
                ok = False
                break
        else:
            eq = (av.astype(str).values == bv.astype(str).values)
            if not eq.all():
                print(f"FAIL  {name}: col {c}: {int((~eq).sum())}/{len(a)} differ")
                ok = False
                break
    rec(name, rows_match=True, schema_match=True, hash_match=ok,
        spark_rows=len(a), oracle_rows=len(b))
    if ok:
        print(f"PASS  {name} ({len(a)} rows)")
        n_pass += 1
    else:
        n_fail += 1

print(f"\n{n_pass} pass, {n_fail} fail, {n_slow} slow-skipped, "
      f"{n_pass + n_fail + n_slow} oracles")
if LEDGER:
    with open(LEDGER, "w") as f:
        json.dump(ledger, f, indent=2, sort_keys=True)
    print(f"ledger -> {LEDGER}")
sys.exit(1 if n_fail else 0)
