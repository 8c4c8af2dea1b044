#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output vs
DuckDB oracles over the same parquet tables. Usage:
  python3 scripts/check_oracles.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    # NO float rounding here: the driver compares exact hashed values, so the
    # local gate must be at least as strict (it was laxer in r1)
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fail = 0
for qdir in sorted(glob.glob(f"{outdir}/*/")):
    name = os.path.basename(qdir.rstrip("/"))
    if only and name not in only:
        continue
    spark_df = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
    if name not in oracle:
        print(f"{name:28s} rows-only: {len(spark_df)} rows "
              f"{'OK' if len(spark_df) > 0 else 'EMPTY!'}")
        if len(spark_df) == 0:
            fail += 1
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name:28s} ORACLE SQL ERROR: {e}")
        fail += 1
        continue
    a, b = canon(spark_df), canon(duck_df)
    schema_ok = list(a.columns) == list(b.columns)
    dtypes_ok = all(str(x) == str(y) for x, y in zip(a.dtypes, b.dtypes))
    rows_ok = len(a) == len(b)
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        vals_ok = True
    except Exception as e:
        vals_ok = False
        err = str(e).split("\n")[0:4]
    # dtypes_ok participates: the driver compares schemas too
    status = "OK" if (schema_ok and dtypes_ok and rows_ok and vals_ok) else "FAIL"
    extra = ""
    if not schema_ok:
        extra += f" cols spark={list(a.columns)} duck={list(b.columns)}"
    if not dtypes_ok:
        extra += f" dtypes spark={[str(t) for t in a.dtypes]} duck={[str(t) for t in b.dtypes]}"
    if not rows_ok:
        extra += f" rows spark={len(a)} duck={len(b)}"
    if not vals_ok and schema_ok and rows_ok:
        merged = a.compare(b) if a.shape == b.shape else None
        extra += f" value diff: {err}"
        if merged is not None and len(merged):
            extra += f" first diffs:\n{merged.head(5)}"
    print(f"{name:28s} {status} rows={len(a)}{extra}")
    if status == "FAIL":
        fail += 1
print("ALL OK" if fail == 0 else f"{fail} FAILURES")
sys.exit(1 if fail else 0)
