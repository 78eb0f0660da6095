#!/usr/bin/env python3
"""Local replica of the driver's correctness compare: for each Verify output
parquet, run the paired oracle SQL in DuckDB over the same sf tables, then
compare rows / schema (column names) / a value hash with columns sorted by
name. Usage: compare_oracle.py <sfDir> <verifyOut>"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> tuple:
    df = df[sorted(df.columns)]
    rows = sorted(tuple(str(v) for v in r) for r in df.itertuples(index=False))
    h = hashlib.sha256("\n".join("|".join(r) for r in rows).encode()).hexdigest()
    return len(df), tuple(sorted(df.columns)), h

fails = 0
for qdir in sorted(glob.glob(f"{outdir}/*/")):
    name = qdir.rstrip("/").split("/")[-1]
    spark_df = pd.concat(
        [pd.read_parquet(p) for p in glob.glob(f"{qdir}/*.parquet")],
        ignore_index=True) if glob.glob(f"{qdir}/*.parquet") else None
    if name not in oracle:
        print(f"{name:24s} rows={len(spark_df) if spark_df is not None else 0} (rows-only)")
        continue
    try:
        odf = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name:24s} ORACLE-ERR {e}")
        fails += 1
        continue
    sr, sc, sh = canon(spark_df)
    orr, oc, oh = canon(odf)
    ok = (sr == orr) and (sc == oc) and (sh == oh)
    if not ok:
        fails += 1
        print(f"{name:24s} MISMATCH rows {sr}/{orr} cols {'OK' if sc==oc else f'{sc} vs {oc}'} hash {'OK' if sh==oh else 'DIFF'}")
    else:
        print(f"{name:24s} ok rows={sr}")
print("FAILS:", fails)
sys.exit(1 if fails else 0)
