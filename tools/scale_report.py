#!/usr/bin/env python3
"""Emit the SCALE_r05.md ratio table from two Bench JSON dumps."""
import json, sys

a = json.load(open(sys.argv[1]))  # sf0.1
b = json.load(open(sys.argv[2]))  # sf1
rows = []
for k in sorted(a["queries"]):
    ta, tb = a["queries"][k], b["queries"].get(k, -1)
    rows.append((tb / ta if ta > 0 and tb > 0 else float("nan"), k, ta, tb))
rows.sort(reverse=True)
print(f"sf0.1 total {a['value']:.1f}s | sf1 total {b['value']:.1f}s | "
      f"ratio {b['value']/a['value']:.2f}x on 10x data")
print()
print("| query | sf0.1 (s) | sf1 (s) | sf1/sf0.1 |")
print("|---|---|---|---|")
for r, k, ta, tb in rows:
    print(f"| {k} | {ta:.2f} | {tb:.2f} | {r:.1f}x |")
