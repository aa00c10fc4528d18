#!/usr/bin/env python3
"""Correctness compare at generated scale factors (e.g. localdata/sf1).

Same compare as tools/check.py (columns sorted by name, rows sorted,
floats rounded 6dp) but:
 - table paths may be directories of part files (ScaleUp output);
 - oracles whose ground-truth SQL is deliberately quadratic (all-pairs
   shingle/cosine scans — the *verification harness*, not the engine
   path) can be skipped with --skip, since DuckDB needs hours on them at
   sf1 while the Spark side still runs its (also exact) formulation.

Usage: python3 tools/scale_check.py SFDIR OUT [--skip name1,name2,...]
"""
import json, sys, glob, math, os

import duckdb

SF = sys.argv[1]
OUT = sys.argv[2]
SKIP = set()
if len(sys.argv) > 4 and sys.argv[3] == "--skip":
    SKIP = set(sys.argv[4].split(","))

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v

def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda r: tuple(str(x) for x in r))

fails = skipped = 0
for name in sorted(oracle):
    if name in SKIP:
        print(f"SKIP {name}: quadratic ground-truth oracle (documented)")
        skipped += 1
        continue
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    s = con.sql(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')")
    scols, srows = normalize(s.columns, s.fetchall())
    try:
        d = con.sql(oracle[name])
        dcols, drows = normalize(d.columns, d.fetchall())
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    if [c.lower() for c in scols] != [c.lower() for c in dcols]:
        print(f"FAIL {name}: columns spark={scols} duck={dcols}")
        fails += 1
    elif len(srows) != len(drows):
        print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
        fails += 1
    elif srows != drows:
        bad = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
        print(f"FAIL {name}: value mismatch, first diffs: {bad}")
        fails += 1
    else:
        print(f"OK   {name}: {len(srows)} rows")

for d in sorted(glob.glob(f"{OUT}/*/")):
    qn = d.rstrip("/").split("/")[-1]
    if qn not in oracle:
        n = con.sql(f"SELECT count(*) FROM read_parquet('{d}*.parquet')").fetchone()[0]
        status = "OK  " if n > 0 else "FAIL"
        print(f"{status} {qn}: rows-only check, {n} rows")
        fails += 0 if n > 0 else 1

print(f"done: fails={fails} skipped={skipped}")
sys.exit(1 if fails else 0)
