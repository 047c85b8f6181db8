#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: check_oracle.py <verify_out_dir> <sf_dir>
Reads each <name>/ parquet written by graft.Verify plus oracle_sql.json,
runs the oracle in DuckDB over the same tables, and compares values
(columns sorted by name, rows sorted, stringified values hashed).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything for engine-neutral compare
    out = df.copy()
    for c in out.columns:
        out[c] = out[c].map(lambda v: canon_val(v))
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out

def canon_val(v):
    import numpy as np
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "<null>"
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(canon_val(x) for x in v) + "]"
    return str(v)

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    names = sorted([d for d in os.listdir(outdir)
                    if os.path.isdir(os.path.join(outdir, d))])
    n_pass = n_fail = n_noora = 0
    for name in names:
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"{name:28s} NO-OUTPUT"); n_fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            print(f"{name:28s} rows-only ({len(spark_df)} rows)"); n_noora += 1
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"{name:28s} ORACLE-ERROR {str(e).splitlines()[0][:90]}")
            n_fail += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"{name:28s} COLUMN-MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1; continue
        if len(a) != len(b):
            print(f"{name:28s} ROWCOUNT spark={len(a)} duck={len(b)}")
            n_fail += 1; continue
        if a.equals(b):
            print(f"{name:28s} PASS ({len(a)} rows)")
            n_pass += 1
        else:
            diff = (a != b).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"{name:28s} VALUE-MISMATCH {int(diff.sum())}/{len(a)} rows differ")
            for i in idx:
                print(f"   spark: {a.loc[i].to_dict()}")
                print(f"   duck : {b.loc[i].to_dict()}")
            n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noora} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
