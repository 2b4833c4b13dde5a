#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify output
parquet + oracle_sql.json, run each oracle in DuckDB over the sf tables,
compare row sets (columns sorted by name, rows sorted)."""
import sys, json, glob, os
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    got = duckdb.sql(f"SELECT * FROM '{d}/*.parquet'").df()
    got = got.reindex(sorted(got.columns), axis=1)
    if name not in oracle:
        print(f"{name:22s} rows-only: {len(got)} rows")
        continue
    try:
        want = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append(name); print(f"{name:22s} ORACLE SQL ERROR: {e}"); continue
    want = want.reindex(sorted(want.columns), axis=1)
    def canon(df):
        return sorted(map(repr, df.itertuples(index=False, name=None)))
    ok_cols = list(got.columns) == list(want.columns)
    ok_rows = canon(got) == canon(want)
    status = "MATCH" if (ok_cols and ok_rows) else "MISMATCH"
    if status == "MISMATCH":
        fails.append(name)
    print(f"{name:22s} {status}  spark={len(got)} duck={len(want)} cols_ok={ok_cols}")
    if status == "MISMATCH" and len(got) < 30 and len(want) < 30:
        print(" spark:", canon(got)[:6]); print(" duck :", canon(want)[:6])
print("FAILED:", fails if fails else "none")
sys.exit(1 if fails else 0)
