#!/usr/bin/env python3
"""Min-merge bench JSON records: per-query minimum across runs (the
round-ledger record form — single-shot timings on a shared box swing on
GC/JIT windows; the min is the structural signal).

Usage: python3 tools/bench_merge.py OUT IN1 IN2 [IN3 ...]
Queries present in only some inputs keep the min over the inputs that
have them.
"""
import json
import sys

out, ins = sys.argv[1], sys.argv[2:]
merged = {}
meta = None
for p in ins:
    try:
        d = json.load(open(p))
    except FileNotFoundError:
        continue
    meta = meta or d
    for q, t in d.get("queries", {}).items():
        merged[q] = min(merged.get(q, t), t)
if meta is None:
    sys.exit(f"bench_merge: none of the inputs could be read: {ins}")
payload = {
    # 'total' is the metric name Bench.scala records — inherit it, and
    # only fall back to the same literal if an input predates the field
    "metric": meta.get("metric", "total"),
    "value": round(sum(merged.values()), 3),
    "unit": "sec",
    "sf": meta.get("sf"),
    "queries": {k: merged[k] for k in sorted(merged)},
}
json.dump(payload, open(out, "w"))
print(f"{len(merged)} queries, total {payload['value']}s -> {out}")
