#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify at a
given SF, then execute each oracle_sql.json query in DuckDB over the same
parquet tables and compare row-for-row (columns sorted by name, values
hashed). Usage: python3 tools/local_verify.py [sfdir] [outdir]
"""
import sys, os, json, glob, subprocess
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)

def main():
    con = duckdb.connect()
    for t in glob.glob(f"{SF}/*.parquet"):
        name = os.path.basename(t).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        rdir = f"{OUT}/{name}"
        if not os.path.isdir(rdir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(pd.concat([pd.read_parquet(p) for p in
                                   sorted(glob.glob(f"{rdir}/*.parquet"))]))
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        ok_schema = list(got.columns) == list(want.columns)
        ok_rows = len(got) == len(want)
        ok_vals = False
        if ok_schema and ok_rows:
            try:
                g = got.astype(str).values.tolist()
                w = want.astype(str).values.tolist()
                ok_vals = g == w
            except Exception as e:
                print(f"  cmp err {name}: {e}")
        if ok_schema and ok_rows and ok_vals:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: schema_ok={ok_schema} rows {len(got)}/{len(want)} vals_ok={ok_vals}")
            if not ok_schema:
                print(f"  got cols:  {list(got.columns)}\n  want cols: {list(want.columns)}")
            if ok_schema and ok_rows and not ok_vals:
                gg, ww = got.astype(str), want.astype(str)
                diff = (gg != ww).any(axis=1)
                idx = diff[diff].index[:3]
                for i in idx:
                    print(f"  row {i}:\n   got  {gg.loc[i].to_dict()}\n   want {ww.loc[i].to_dict()}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
