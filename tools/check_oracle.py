#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: check_oracle.py <verify_out_dir> <sf_dir>
Reads each <name>/ parquet written by graft.Verify plus oracle_sql.json,
runs the oracle in DuckDB over the same tables, and compares values
(columns sorted by name, rows sorted, stringified values hashed).

Env (for large-SF spot drives, VERDICT r11 #4):
  ORACLE_TIMEOUT_S   per-oracle watchdog; an overrunning DuckDB query
                     is interrupted and reported ORACLE-TIMEOUT (not a
                     failure — the ENGINE side still verified, the
                     oracle just could not keep up at that SF)
  ORACLE_MEM_LIMIT   duckdb memory_limit (e.g. "80GB")
"""
import sys, os, json, glob, threading
import duckdb
import pandas as pd

TIMEOUT_S = float(os.environ.get("ORACLE_TIMEOUT_S", "0") or 0)
MEM_LIMIT = os.environ.get("ORACLE_MEM_LIMIT", "")

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
    if MEM_LIMIT:
        con.sql(f"SET memory_limit='{MEM_LIMIT}'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    n_timeout = 0
    def run_oracle(sql):
        if TIMEOUT_S <= 0:
            return con.sql(sql).df()
        timer = threading.Timer(TIMEOUT_S, con.interrupt)
        timer.start()
        try:
            return con.sql(sql).df()
        finally:
            timer.cancel()
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
            duck_df = run_oracle(oracle[name])
        except duckdb.InterruptException:
            print(f"{name:28s} ORACLE-TIMEOUT (> {TIMEOUT_S:.0f}s)")
            n_timeout += 1; continue
        except Exception as e:
            msg = str(e).splitlines()[0][:90]
            if "INTERRUPT" in msg.upper():
                print(f"{name:28s} ORACLE-TIMEOUT (> {TIMEOUT_S:.0f}s)")
                n_timeout += 1; continue
            print(f"{name:28s} ORACLE-ERROR {msg}")
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
    extra = f", {n_timeout} oracle-timeout" if n_timeout else ""
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noora} rows-only{extra} ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
