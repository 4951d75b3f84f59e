#!/usr/bin/env python3
"""Dev-only pre-commit check mimicking the driver's correctness gate:
run graft.Verify first (sbt "runMain graft.Verify <sfDir> <outDir>"),
then this script compares each dumped parquet against its DuckDB oracle.

Usage: python3 tools/check_oracle.py <sfDir> <outDir> [query ...]
"""
import sys, os, json, glob
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        fails.append((name, "no spark output")); continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"oracle error: {str(e)[:200]}")); continue
    got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        fails.append((name, f"schema: oracle={list(exp.columns)} spark={list(got.columns)}")); continue
    # dtype drift (e.g. DuckDB HUGEINT from sum-over-int vs Spark BIGINT) breaks
    # the driver's value hash even when pandas compares values equal — fail hard.
    # (int width differences — int32 vs int64 — hash identically; only a kind
    # change like DuckDB HUGEINT→float64 or object breaks it)
    bad_dtypes = [(c, str(exp[c].dtype), str(got[c].dtype)) for c in exp.columns
                  if exp[c].dtype.kind != got[c].dtype.kind]
    if bad_dtypes:
        fails.append((name, f"dtypes: {bad_dtypes}")); continue
    if len(exp) != len(got):
        fails.append((name, f"rows: oracle={len(exp)} spark={len(got)}")); continue
    # driver-style: sort rows, compare values
    exp_s = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    got_s = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    try:
        import pandas as pd
        pd.testing.assert_frame_equal(exp_s, got_s, check_dtype=False, check_exact=True)
        passes.append(name)
    except AssertionError as e:
        diff = str(e).split("\n")[0]
        fails.append((name, f"values: {diff[:300]}"))

print(f"PASS {len(passes)}: {' '.join(passes)}")
for name, why in fails:
    print(f"FAIL {name}: {why}")
sys.exit(1 if fails else 0)
