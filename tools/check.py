#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs DuckDB oracles.

Mimics the driver's t2 gate: run graft.Verify (Spark) into OUT, then run
each oracle_sql.json entry in DuckDB over the same parquet tables, sort
columns by name, sort rows, and compare values.

Usage: python3 tools/check.py [SFDIR] [OUT]
"""
import json, sys, glob, math

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

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

ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

fails = 0
for name in sorted(oracle):
    if ONLY is not None and name not in ONLY:
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

# queries without oracle entries (rows-only in the driver)
for d in sorted(glob.glob(f"{OUT}/*/")):
    qn = d.rstrip("/").split("/")[-1]
    if qn not in oracle:
        n = con.sql(f"SELECT count(*) FROM read_parquet('{d}*.parquet')").fetchone()[0]
        status = "OK  " if n > 0 else "FAIL"
        print(f"{status} {qn}: rows-only check, {n} rows")
        fails += 0 if n > 0 else 1

sys.exit(1 if fails else 0)
