#!/usr/bin/env python3
"""External single-node baseline for the dedup family (VERDICT r02 #4).

Times DuckDB (the oracle engine — a state-of-the-art native single-node
OLAP engine) executing the SAME semantic dedup queries the engine runs,
at the same data scale, on the same machine. This makes the "fast on a
single node" claim externally falsifiable instead of self-referential:
the oracle SQL is the already-hash-verified equivalent of each Spark
query, so both engines compute identical results.

Usage: microbench_dedup.py <verify_out_dir> <sf_dir> [query ...]
  <verify_out_dir> must contain oracle_sql.json (written by graft.Verify).
Prints one JSON line: {"engine":"duckdb","sf":...,"queries":{name:sec}}.
"""
import sys, os, json, time
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
DEFAULT = [
    "q29_dedup_exact",
    "q30_dedup_ngram_jaccard",
    "q31_dedup_minhash_lsh",
    "q33_dedup_simhash",
    "q52_dedup_simhash_hamming",
    "q82_dedup_simhash_multiindex",
    "q75_winnow_overlap",
    "q84_dedup_clusters_star",
]

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    results = {}
    for name in names:
        if name not in oracle:
            results[name] = None
            continue
        sql = oracle[name]
        best = None
        for _ in range(2):  # best-of-2, same policy as graft.Bench
            t0 = time.time()
            con.sql(sql).arrow()  # materialize every output column
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        results[name] = round(best, 3)
    print(json.dumps({"engine": "duckdb", "sf": sfdir, "queries": results}))

if __name__ == "__main__":
    main()
