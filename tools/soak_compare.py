#!/usr/bin/env python3
"""Two-run determinism soak: value-compare every query's parquet output
across two Verify runs with DuckDB EXCEPT ALL in both directions.

Usage: python3 tools/soak_compare.py <outDirA> <outDirB>
"""
import sys
import os
import duckdb

a, b = sys.argv[1], sys.argv[2]
qs = sorted(d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d)))
con = duckdb.connect()
bad = []
for q in qs:
    pa = os.path.join(a, q, "*.parquet")
    pb = os.path.join(b, q, "*.parquet")
    if not os.path.isdir(os.path.join(b, q)):
        bad.append((q, "missing in B"))
        continue
    try:
        d1 = con.execute(
            f"SELECT count(*) FROM (SELECT * FROM read_parquet('{pa}') "
            f"EXCEPT ALL SELECT * FROM read_parquet('{pb}'))").fetchone()[0]
        d2 = con.execute(
            f"SELECT count(*) FROM (SELECT * FROM read_parquet('{pb}') "
            f"EXCEPT ALL SELECT * FROM read_parquet('{pa}'))").fetchone()[0]
        if d1 or d2:
            bad.append((q, f"A\\B={d1} B\\A={d2}"))
    except Exception as e:  # schema mismatch etc.
        bad.append((q, f"error: {e}"))
for q, why in bad:
    print(f"DIFF {q}: {why}")
print(f"== soak: {len(qs) - len(bad)} identical, {len(bad)} differing, {len(qs)} total")
sys.exit(1 if bad else 0)
