#!/usr/bin/env python3
"""External single-node baseline for the dedup family (VERDICT r02 #4).

Times DuckDB (the container's oracle engine) executing the SAME dedup
semantics the engine runs — literally the oracleSql text dumped by
graft.Verify, which is an independent DuckDB implementation of each
operator (shingle/minhash/simhash pipelines in SQL) — over the sf0.1
parquet. This makes the "fast" claim non-circular: the engine's BENCH
numbers can be read against an external engine executing the same
operator at the same data scale on the same box.

Methodology mirrors graft.Bench: full result materialization, best of 3
runs (DuckDB has no JIT warmup, but the first run pays buffer-pool
population), all cores (DuckDB defaults to one thread per CPU, matching
local[32]).

Usage: external_bench.py [oracle_sql.json] [sf_dir] [q1,q2,...]
(the optional third arg overrides the default QUERIES list)
"""
import os, sys, time, json
import duckdb

QUERIES = [
    "q29_dedup_exact",
    "q30_dedup_ngram_jaccard",
    "q31_dedup_minhash_lsh",
    "q33_dedup_simhash",
    "q52_dedup_simhash_hamming",
    "q82_dedup_simhash_multiindex",
    "q63_dedup_clusters",
    "q75_winnow_overlap",
    # round 5 additions: iterative + curation shapes
    "q105_pagerank_dupgraph",
    "q101_histogram_percentile",
    "q103_stratified_sample",
    "q104_dedup_retention",
]

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    oracle_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out/oracle_sql.json"
    sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    queries = sys.argv[3].split(",") if len(sys.argv) > 3 else QUERIES
    oracle = json.load(open(oracle_path))

    def fresh_connection(d):
        c = duckdb.connect()
        for t in TABLES:
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
        return c

    con = fresh_connection(sfdir)
    # EXT_RUNS trims best-of-3 for minutes-long oracles (the ER
    # recursive-CTE class); EXT_TIMEOUT_S interrupts a run that exceeds
    # the budget so one DNF query cannot eat the whole table (recorded
    # as an error row — a DNF at a given SF is itself a result).
    runs = int(os.environ.get("EXT_RUNS", "3"))
    timeout_s = float(os.environ.get("EXT_TIMEOUT_S", "0")) or None
    out = {}
    for name in queries:
        sql = oracle[name]
        times = []
        rows = None
        err = None
        try:
            for _ in range(runs):
                timer = None
                fired = []
                if timeout_s:
                    import threading
                    # the timer only interrupts while THIS run is still
                    # active: an unguarded con.interrupt() can fire after
                    # fetchall() returns but before cancel(), poisoning
                    # the shared connection for the next run (ADVICE r9)
                    active = threading.Event()
                    active.set()

                    def watchdog():
                        if active.is_set():
                            fired.append(True)
                            con.interrupt()
                    timer = threading.Timer(timeout_s, watchdog)
                    timer.start()
                try:
                    t0 = time.time()
                    rows = len(con.sql(sql).fetchall())
                    times.append(time.time() - t0)
                finally:
                    if timer:
                        active.clear()
                        timer.cancel()
                        timer.join()  # a started watchdog finishes before we test `fired`
                        if fired:
                            # an interrupt landed (possibly post-result):
                            # recreate the connection so the stray state
                            # cannot fail the next run spuriously
                            con = fresh_connection(sfdir)
        except Exception as e:  # a query that cannot complete (e.g. spill
            # exhausting disk at sf1) is a RESULT, not a reason to lose
            # the rest of the table
            err = f"{type(e).__name__}: {e}"[:300]
        if err and not times:
            out[name] = {"error": err}
            print(f"{name:30s} ERROR {err[:80]}", file=sys.stderr)
            continue
        out[name] = {"best_s": round(min(times), 3),
                     "all_s": [round(t, 3) for t in times],
                     "rows": rows}
        if err:
            out[name]["error_after_runs"] = err
        print(f"{name:30s} best={min(times):6.2f}s rows={rows}", file=sys.stderr)
    print(json.dumps({"engine": "duckdb", "version": duckdb.__version__,
                      "sf": sfdir, "queries": out}))


if __name__ == "__main__":
    main()
