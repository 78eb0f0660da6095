#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL from
Verify's oracle_sql.json in DuckDB over the same parquet tables, compare to
the Spark result parquet (columns sorted by name, rows sorted, values
hashed). Usage: crosscheck.py <sfDir> <verifyOutDir>."""
import json, sys, glob
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for tbl in ["region","nation","customer","supplier","part","orders",
            "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf}/{tbl}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"{name:24s} MISSING spark output"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"{name:24s} ORACLE ERROR: {e}"); fails += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"{name:24s} SCHEMA MISMATCH {list(got.columns)} vs {list(exp.columns)}")
        fails += 1; continue
    if len(got) != len(exp):
        print(f"{name:24s} ROWS {len(got)} vs {len(exp)}"); fails += 1; continue
    g = got.sort_values(list(got.columns)).reset_index(drop=True)
    e = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    g = g.astype(str); e = e.astype(str)
    if not g.equals(e):
        diff = (g != e).any(axis=1)
        print(f"{name:24s} VALUE MISMATCH ({diff.sum()} rows)")
        print(pd.concat([g[diff].head(3).add_prefix("got_"),
                         e[diff].head(3).add_prefix("exp_")], axis=1).to_string())
        fails += 1; continue
    print(f"{name:24s} OK ({len(got)} rows)")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
