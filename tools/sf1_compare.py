#!/usr/bin/env python3
"""Per-family wall ratios of the sf1 full-registry drive vs the sf0.1
record (r13 verdict item 1's ledger).

Usage: python3 tools/sf1_compare.py [BENCH_SF1.json] [BENCH_LOCAL_rN.json]

Caveats the table carries explicitly:
 - sf1 is reps=1 (single shot) vs the sf0.1 record's min-of-3, so every
   ratio includes one-shot scheduling noise ON TOP of the 10x data;
 - the __yardstick row (corpus-independent) calibrates the day's box
   factor between the two artifacts.
"""
import json
import sys
from collections import defaultdict

sf1_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SF1.json"
base_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_LOCAL_r13.json"

sf1 = json.load(open(sf1_path))["queries"]
base = json.load(open(base_path))["queries"]

yard = (sf1.get("__yardstick"), base.get("__yardstick"))
common = sorted(set(sf1) & set(base) - {"__yardstick"})

fam_sf1 = defaultdict(float)
fam_base = defaultdict(float)
fam_n = defaultdict(int)
rows = []
for q in common:
    f = q.split("_")[0]
    fam_sf1[f] += sf1[q]
    fam_base[f] += base[q]
    fam_n[f] += 1
    rows.append((sf1[q] / base[q] if base[q] else float("inf"), q))

print(f"yardstick: sf1-day={yard[0]} base-day={yard[1]} "
      f"box-factor={yard[0]/yard[1]:.2f}" if all(yard) else f"yardstick: {yard}")
print(f"common queries: {len(common)}")
print(f"totals: sf1={sum(sf1[q] for q in common):.1f}s "
      f"base={sum(base[q] for q in common):.1f}s "
      f"ratio={sum(sf1[q] for q in common)/sum(base[q] for q in common):.2f}")
print("\nper-family (sum seconds):")
print(f"{'family':16s} {'n':>3s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>6s}")
for f in sorted(fam_sf1, key=lambda f: -fam_sf1[f]):
    r = fam_sf1[f] / fam_base[f] if fam_base[f] else float("inf")
    print(f"{f:16s} {fam_n[f]:3d} {fam_base[f]:8.1f} {fam_sf1[f]:8.1f} {r:6.2f}")
print("\ntop-20 per-query ratios (worst first):")
for r, q in sorted(rows, reverse=True)[:20]:
    print(f"{q:36s} sf0.1={base[q]:7.2f} sf1={sf1[q]:7.2f} ratio={r:5.1f}")
print("\ntop-15 absolute sf1 seconds:")
for q in sorted(common, key=lambda q: -sf1[q])[:15]:
    print(f"{q:36s} sf1={sf1[q]:7.2f} sf0.1={base[q]:7.2f}")
