#!/usr/bin/env python3
"""Chain-decomposed sf1 oracle for the ER composition (q191 labeling,
q201 incremental, q203 ingest) — round 15.

The whole-family DuckDB oracle (erFullRecomputeOracle) brute-forces
levenshtein over customer x customer and needs 1800 s already at
sf0.1 (CORRECTNESS_sf01_full.json); at sf1 it DNFs. The quadratic
half is the CANDIDATE join — and that half is now independently
verified at sf1/sf10 by tools/verify_q121_sf1.py (every emitted pair
levenshtein-recomputed; brute-force panel recall proves SymSpell
deletion-key completeness). This checker verifies the REST of the
composition on top of that verified pair set:

  edges  = the engine's q121 (id_a, id_b) pairs at this SF —
           exhaustively sound + panel-complete per
           CORRECTNESS_sf{1,10}_q121.json — restricted to same-nation
           (the oracle's own blocking predicate, re-applied by DuckDB
           from the raw customer table);
  labels = DuckDB's OWN recursive min-label closure over those edges
           (the erFullRecomputeOracle CTEs verbatim from `e` down:
           reach / lab / singleton self-label / csize);
  assert = the engine's q191/q201/q203 output equals DuckDB's
           labeling EXACTLY (row set equality over cust_id, label,
           csize).

This is a CHAIN argument, stated honestly: the candidate tier is the
engine's output verified by its own decomposed oracle; the blocking,
closure, labeling and sizing tiers are DuckDB's independent
computation. A wrong blocked edge, a dropped cluster merge, a wrong
min-label, or a wrong size all fail the set equality.

Usage: verify_q191_sf1.py <labels_parquet> [sfdir] [q121_pairs]
                          [out_json] [query_name]
"""
import json
import os
import sys
import time

import duckdb

LABELS = sys.argv[1] if len(sys.argv) > 1 else \
    "/tmp/qer_sf1/q191_entity_resolution.parquet"
SFDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-sf1"
PAIRS = sys.argv[3] if len(sys.argv) > 3 else \
    "/tmp/q121_sf1/q121_fuzzy_join_ed1.parquet"
OUT = sys.argv[4] if len(sys.argv) > 4 else "CORRECTNESS_sf1_q191.json"
QNAME = sys.argv[5] if len(sys.argv) > 5 else "q191_entity_resolution"

for v in ("LABELS", "PAIRS"):
    p = globals()[v]
    if os.path.isdir(p):
        globals()[v] = p.rstrip("/") + "/*.parquet"


def main():
    t0 = time.time()
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    report = {"query": QNAME, "sfdir": SFDIR, "labels": LABELS,
              "edges_from": PAIRS}

    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{LABELS}')").fetchone()[0]
    report["engine_rows"] = n

    diff = con.execute(f"""
      WITH RECURSIVE cust AS (
        SELECT c_custkey, c_nationkey
        FROM read_parquet('{SFDIR}/customer.parquet')),
      pr AS (SELECT p.id_a AS ia, p.id_b AS ib
        FROM read_parquet('{PAIRS}') p
        JOIN cust a ON a.c_custkey = p.id_a
        JOIN cust b ON b.c_custkey = p.id_b
        WHERE a.c_nationkey = b.c_nationkey),
      e AS (SELECT ia u, ib v FROM pr UNION ALL SELECT ib, ia FROM pr),
      reach AS (SELECT u AS node, u AS label FROM e
        UNION SELECT e.u, r.label FROM e JOIN reach r ON e.v = r.node),
      lab AS (SELECT node, MIN(label) lbl FROM reach GROUP BY 1),
      allc AS (SELECT c_custkey AS cust_id,
          COALESCE(lab.lbl, c_custkey) AS label
        FROM cust LEFT JOIN lab ON cust.c_custkey = lab.node),
      sz AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS csize
        FROM allc GROUP BY 1),
      truth AS (SELECT cust_id, CAST(label AS BIGINT) AS label, csize
        FROM allc JOIN sz USING (label)),
      eng AS (SELECT cust_id, label, csize FROM read_parquet('{LABELS}'))
      SELECT
        (SELECT COUNT(*) FROM truth) AS n_truth,
        (SELECT COUNT(*) FROM (SELECT * FROM truth EXCEPT SELECT * FROM eng))
          AS truth_minus_eng,
        (SELECT COUNT(*) FROM (SELECT * FROM eng EXCEPT SELECT * FROM truth))
          AS eng_minus_truth""").fetchone()
    report["compare"] = {
        "truth_rows": diff[0], "truth_minus_engine": diff[1],
        "engine_minus_truth": diff[2],
        "pass": diff[1] == 0 and diff[2] == 0 and diff[0] == n and n > 0}

    report["total_sec"] = round(time.time() - t0, 1)
    report["pass"] = report["compare"]["pass"]
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    sys.exit(0 if report["pass"] else 1)


if __name__ == "__main__":
    main()
