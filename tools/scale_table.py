#!/usr/bin/env python3
"""Paired-campaign ratio table: compare two Bench JSON artifacts
(e.g. sf0.1 vs sf1) query by query, print a markdown table sorted by
ratio desc plus totals. Usage: scale_table.py SMALL.json BIG.json [min_ratio]"""
import json, sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
min_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0

sq, bq = small["queries"], big["queries"]
shared = sorted(set(sq) & set(bq), key=lambda k: -(bq[k] / max(sq[k], 1e-9)))
print(f"small: {small['sf']} total={sum(sq[k] for k in shared):.1f}s "
      f"(official={small.get('official')}, ext_peak={small.get('ext_cpu_peak_cores')})")
print(f"big:   {big['sf']} total={sum(bq[k] for k in shared):.1f}s "
      f"(official={big.get('official')}, ext_peak={big.get('ext_cpu_peak_cores')})")
print(f"shared queries: {len(shared)}  "
      f"wall ratio: {sum(bq[k] for k in shared)/sum(sq[k] for k in shared):.2f}x")
print()
print("| query | small s | big s | ratio |")
print("|---|---|---|---|")
for k in shared:
    r = bq[k] / max(sq[k], 1e-9)
    if r >= min_ratio:
        print(f"| `{k}` | {sq[k]:.2f} | {bq[k]:.2f} | {r:.1f}x |")
only_small = set(sq) - set(bq)
only_big = set(bq) - set(sq)
if only_small: print(f"\nonly in small: {sorted(only_small)}")
if only_big: print(f"\nonly in big: {sorted(only_big)}")
