#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>
Registers each parquet table by bare name, runs every oracle_sql.json query,
and hash-compares (column-name-sorted, row-sorted) with the Spark parquet.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
        try:
            df[c] = df[c].astype("float64") if df[c].dtype.kind in "fiu" else df[c].astype(str)
        except Exception:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


fails = 0
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not spark_files:
        print(f"{name}: MISSING spark output")
        fails += 1
        continue
    got = canon(pd.concat([pd.read_parquet(f) for f in spark_files]))
    want = canon(con.execute(sql).df())
    if list(got.columns) != list(want.columns):
        print(f"{name}: SCHEMA mismatch spark={list(got.columns)} oracle={list(want.columns)}")
        fails += 1
        continue
    if len(got) != len(want):
        print(f"{name}: ROWCOUNT mismatch spark={len(got)} oracle={len(want)}")
        fails += 1
        continue
    eq = got.equals(want)
    if not eq:
        diff = (got != want) & ~(got.isna() & want.isna())
        bad = diff.any(axis=1)
        print(f"{name}: VALUE mismatch ({bad.sum()} rows)")
        print("spark:", got[bad].head(3).to_string())
        print("oracle:", want[bad].head(3).to_string())
        fails += 1
    else:
        print(f"{name}: OK ({len(got)} rows)")

queries_only = set()  # queries without oracle get rows-only check
sys.exit(1 if fails else 0)
