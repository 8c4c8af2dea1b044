#!/usr/bin/env python3
"""Compare two independent Verify capture runs of the digest-gated kg_*
queries and emit the pinned-constant oracle SQL for each (VALUES literal).
Usage: gen_kg_oracles.py DIR1 DIR2 [query ...]
"""
import sys, glob, os
import duckdb

d1, d2 = sys.argv[1], sys.argv[2]
names = sys.argv[3:] or sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(d1, "kg_*"))
    if os.path.isdir(p))

con = duckdb.connect()
ok = True
for name in names:
    r1 = con.execute(f"SELECT table_name, cols, n_rows, digest FROM parquet_scan('{d1}/{name}/*.parquet')").fetchall()
    r2 = con.execute(f"SELECT table_name, cols, n_rows, digest FROM parquet_scan('{d2}/{name}/*.parquet')").fetchall()
    if r1 != r2:
        print(f"-- NONDETERMINISTIC: {name}\n--   run1={r1}\n--   run2={r2}")
        ok = False
        continue
    assert len(r1) == 1, (name, r1)
    t, cols, n, dig = r1[0]
    print(f'''    "{name}" ->
      """SELECT '{t}' AS table_name, '{cols}' AS cols,
          {n}::BIGINT AS n_rows, '{dig}' AS digest""",
''')
sys.exit(0 if ok else 1)
