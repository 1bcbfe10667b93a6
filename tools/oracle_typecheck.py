#!/usr/bin/env python3
"""Oracle type-parity gate — the class-killer for the r9 red rows.

The driver's correctness compare canonicalizes column VALUES after
sorting, but its hash normalizer is type-sensitive: a DuckDB output
column that widens to HUGEINT (int128 — what integer SUM() does when
left uncast) hashes differently from the BIGINT the Spark side emits,
even when every value is equal. r9 shipped exactly 4 such oracles and
they were the round's only red rows.

This gate runs `DESCRIBE <oracle>` for EVERY registered oracle against
the real testdata views and fails on any output column whose DuckDB
type is outside the portable whitelist — so the next uncast SUM dies at
commit time, not in a red round-artifact.

Usage: python3 tools/oracle_typecheck.py [oracle_sql.json] [sf_dir]
(defaults: /tmp/verify_out/oracle_sql.json, /root/testdata/sf0.01)
"""
import sys, os, json, re
import duckdb

ORACLES = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out/oracle_sql.json"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Types whose canonical hash is proven stable across DuckDB and the
# driver normalizer (every green row in CORRECTNESS_r01..r09 is one of
# these). Everything else — HUGEINT/UHUGEINT (int128 from uncast integer
# SUM), DECIMAL (double-rounding vs the double route, the a12 lesson),
# FLOAT (float32 repr drift), unsigned ints — fails the gate.
WHITELIST = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
             "VARCHAR", "BOOLEAN", "TIMESTAMP", "DATE"}

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

# Day-bucket keys must ride integer division (`// 86400`, the e17
# family discipline), never a double FLOOR — mixed routes for the SAME
# key across sibling queries is the drift class the r10 verdict flagged
# on e1/e6. Hour/minute buckets (3600/300) are a separately-proven
# shared text; only the day key had both forms in the registry.
# r11 ADVICE: tolerate nested calls inside epoch(..) — the old [^)]*
# body could not match FLOOR(epoch(date_trunc('second', ts)) / 86400).
# r12 review: the body must not contain '/' (an unbounded .*? with
# DOTALL backtracks across the WHOLE query, so "FLOOR(epoch(ts)/3600)
# ... span / 86400" false-positives). epoch's argument never contains
# a division; the first '/' it meets is the bucket divisor itself.
# Requiring the close-paren before the slash keeps integer `// 86400`
# (the second slash breaks `\)\s*/\s*86400`) from false-positives.
DAYKEY = re.compile(r"FLOOR\s*\(\s*epoch\s*\([^/;]*?\)\s*/\s*86400", re.I | re.S)

oracle = json.load(open(ORACLES))
bad = []
for name in sorted(oracle):
    if DAYKEY.search(oracle[name]):
        bad.append((name, "day key via double FLOOR(epoch(..)/86400) — "
                          "use integer `// 86400` (e17 discipline)"))
for name in sorted(oracle):
    try:
        schema = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
    except Exception as e:
        bad.append((name, f"DESCRIBE failed: {str(e).splitlines()[0][:120]}"))
        continue
    for col_name, col_type, *_ in schema:
        if col_type not in WHITELIST:
            bad.append((name, f"column {col_name}: {col_type}"))

for name, msg in bad:
    print(f"TYPEFAIL  {name}: {msg}")
print(f"{len(oracle) - len({n for n, _ in bad})} ok, "
      f"{len({n for n, _ in bad})} type-unportable, {len(oracle)} oracles")
sys.exit(1 if bad else 0)
