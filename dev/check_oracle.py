#!/usr/bin/env python3
"""Dev-only pre-check that mimics the driver's DuckDB-oracle compare.

Usage: python3 dev/check_oracle.py <sfDir> <verifyOutDir>

NOT part of the library (the Scala engine never depends on this); it only
exists so oracle SQL mismatches are caught before the driver's t2 run.
"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    spark_dir = os.path.join(outdir, name)
    files = glob.glob(os.path.join(spark_dir, "*.parquet"))
    if not files:
        print(f"MISSING  {name}: no spark output"); fail += 1; continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}"); fail += 1; continue
    got = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'").fetchdf()
    # driver-style compare: sort columns by name, then sort rows, hash values
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"SCHEMA   {name}: oracle={list(exp.columns)} spark={list(got.columns)}")
        fail += 1; continue
    if len(exp) != len(got):
        print(f"ROWCOUNT {name}: oracle={len(exp)} spark={len(got)}"); fail += 1; continue
    exp_s = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    got_s = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    try:
        import pandas as pd
        pd.testing.assert_frame_equal(exp_s, got_s, check_dtype=False, check_exact=True)
        print(f"OK       {name} ({len(exp)} rows)"); ok += 1
    except AssertionError as e:
        print(f"VALUES   {name}: {str(e).splitlines()[-1] if str(e) else 'diff'}")
        fail += 1
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
