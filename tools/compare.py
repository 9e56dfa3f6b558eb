#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables, compare to the Spark result parquet
(sort columns by name, sort rows, compare values)."""
import sys, os, json, glob
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    try:
        odf = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        fail += 1
        continue
    sdf = pd.read_parquet(spark_path)
    # sort columns by name
    odf = odf.reindex(sorted(odf.columns), axis=1)
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    if list(odf.columns) != list(sdf.columns):
        print(f"FAIL {name}: columns {list(sdf.columns)} vs oracle {list(odf.columns)}")
        fail += 1
        continue
    if len(odf) != len(sdf):
        print(f"FAIL {name}: rows {len(sdf)} vs oracle {len(odf)}")
        fail += 1
        continue
    o = odf.astype(str).sort_values(by=list(odf.columns)).reset_index(drop=True)
    s = sdf.astype(str).sort_values(by=list(sdf.columns)).reset_index(drop=True)
    if o.equals(s):
        print(f"PASS {name} ({len(sdf)} rows)")
    else:
        neq = (o != s).any(axis=1)
        print(f"FAIL {name}: {neq.sum()} differing rows; first diff:")
        idx = neq.idxmax()
        for c in o.columns:
            if o.at[idx, c] != s.at[idx, c]:
                print(f"  col={c}\n   oracle: {o.at[idx,c][:300]}\n   spark : {s.at[idx,c][:300]}")
        fail += 1
print(f"{'ALL PASS' if fail == 0 else f'{fail} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fail else 0)
