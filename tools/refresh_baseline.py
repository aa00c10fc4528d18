#!/usr/bin/env python3
"""Refresh bench/bench_baseline.json: per-query min over the sweep
JSONs given as arguments (queries present in only some sweeps take the
min over those). Compact JSON per repo tooling convention."""
import json, re, sys

def load(p):
    s = open(p).read()
    m = re.search(r'\{"metric".*', s)
    if m is None:
        sys.exit(f"{p}: no '{{\"metric\"...' payload line — not a sweep JSON")
    return json.loads(m.group(0))

paths = sys.argv[1:]
if not paths:
    sys.exit("usage: refresh_baseline.py <sweep.json> [<sweep.json> ...]")
sweeps = [load(p) for p in paths]
sfs = {sw.get("sf") for sw in sweeps}
if len(sfs) != 1:
    sys.exit(f"refusing to min-merge sweeps from different scale factors: {sorted(sfs)}")
queries = {}
for sw in sweeps:
    for q, v in sw['queries'].items():
        if q not in queries or v < queries[q]:
            queries[q] = v
total = round(sum(queries.values()), 3)
out = {
    "metric": "total", "value": total, "unit": "sec",
    "queries": {q: queries[q] for q in sorted(queries)},
    "n_queries": len(queries),
    "sf": sweeps[-1]["sf"],
    "note": "committed baseline: per-query min over final sweeps " +
            ", ".join(paths),
}
with open('bench/bench_baseline.json', 'w') as f:
    f.write(json.dumps(out, separators=(',', ':')) + "\n")
print("baseline:", total, "s over", len(queries), "queries")
