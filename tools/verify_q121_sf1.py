#!/usr/bin/env python3
"""Decomposed sf1+ oracle for q121_fuzzy_join_ed1 (round 15 — the
fuzzy/ER family's candidate core joins the deep tier).

The ER family's whole-query DuckDB oracles are quadratic: they need
1800 s already at sf0.1 and DNF at sf1 (CORRECTNESS_sf01_full.json),
so above sf0.1 the family's correctness rested on the SymSpell
completeness proof vs DP brute force in spec plus the
incremental == recompute identities. This checker measures the
candidate core directly at sf1/sf10, in the verify_q30_sf1.py halves:

  (a) SOUNDNESS, exhaustive: for EVERY emitted (id_a, id_b, dist)
      pair, DuckDB recomputes levenshtein(name_a, name_b) from the raw
      customer table (participants only — linear in output) and
      asserts dist matches, dist <= 1, id_a < id_b.

  (b) RECALL + precision, exact, on an md5-bottom-N customer panel:
      the truth is the brute-force levenshtein <= 1 join over
      panel x panel (an abs(len diff) <= 1 band — exact-necessary for
      ed <= 1 — keeps the nested loop affordable), and the engine's
      pairs restricted to the panel must equal it EXACTLY. SymSpell's
      deletion-key completeness claim is exactly what this tests: a
      missed deletion-key collision class would show up as `missed`.

Usage: verify_q121_sf1.py [sfdir] [pairs_parquet] [out_json] [sampleN]
Defaults: /tmp/graft-sf1 /tmp/q121_sf1/q121_fuzzy_join_ed1.parquet
          CORRECTNESS_sf1_q121.json 15000
"""
import json
import os
import sys
import time

import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-sf1"
PAIRS = sys.argv[2] if len(sys.argv) > 2 else \
    "/tmp/q121_sf1/q121_fuzzy_join_ed1.parquet"
OUT = sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_sf1_q121.json"
SAMPLE_N = int(sys.argv[4]) if len(sys.argv) > 4 else 15000

if os.path.isdir(PAIRS):
    PAIRS = PAIRS.rstrip("/") + "/*.parquet"

CUST = "read_parquet('{sfdir}/customer.parquet')".format(sfdir=SFDIR)


def main():
    t0 = time.time()
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    report = {"query": "q121_fuzzy_join_ed1", "sfdir": SFDIR,
              "pairs": PAIRS, "sample_n": SAMPLE_N}

    n_pairs = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{PAIRS}')").fetchone()[0]
    report["engine_pairs"] = n_pairs

    # (a) SOUNDNESS on every emitted pair.
    t1 = time.time()
    bad = con.execute(f"""
      WITH p AS (SELECT id_a, id_b, dist FROM read_parquet('{PAIRS}')),
      chk AS (SELECT p.id_a, p.id_b, p.dist,
          CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS d2
        FROM p JOIN {CUST} a ON a.c_custkey = p.id_a
               JOIN {CUST} b ON b.c_custkey = p.id_b)
      SELECT
        (SELECT COUNT(*) FROM chk WHERE d2 <> dist OR dist > 1)
          AS bad_dist,
        (SELECT COUNT(*) FROM p WHERE id_a >= id_b) AS bad_order,
        (SELECT COUNT(*) FROM p) - (SELECT COUNT(*) FROM chk)
          AS unresolved_ids""").fetchone()
    report["soundness"] = {
        "bad_dist": bad[0], "bad_order": bad[1], "unresolved_ids": bad[2],
        "sec": round(time.time() - t1, 1),
        "pass": bad[0] == 0 and bad[1] == 0 and bad[2] == 0}

    # (b) RECALL + precision within the md5-bottom-N panel: brute-force
    # levenshtein <= 1 truth (length band |la-lb| <= 1 is necessary).
    t2 = time.time()
    con.execute(f"""
      CREATE TABLE samp AS
      SELECT c_custkey AS id, c_name AS name, length(c_name) AS ln
      FROM {CUST}
      ORDER BY md5('q121s_' || CAST(c_custkey AS VARCHAR)), c_custkey
      LIMIT {SAMPLE_N}""")
    diff = con.execute(f"""
      WITH truth AS (SELECT a.id AS id_a, b.id AS id_b
        FROM samp a JOIN samp b
          ON a.id < b.id AND abs(a.ln - b.ln) <= 1
        WHERE levenshtein(a.name, b.name) <= 1),
      eng AS (SELECT id_a, id_b FROM read_parquet('{PAIRS}')
        SEMI JOIN samp sa ON id_a = sa.id),
      engs AS (SELECT eng.* FROM eng SEMI JOIN samp sb ON id_b = sb.id)
      SELECT
        (SELECT COUNT(*) FROM truth) AS n_truth,
        (SELECT COUNT(*) FROM engs) AS n_engine_in_sample,
        (SELECT COUNT(*) FROM (SELECT * FROM truth EXCEPT SELECT * FROM engs))
          AS missed,
        (SELECT COUNT(*) FROM (SELECT * FROM engs EXCEPT SELECT * FROM truth))
          AS extra""").fetchone()
    report["recall_sample"] = {
        "truth_pairs": diff[0], "engine_pairs_in_sample": diff[1],
        "missed": diff[2], "extra": diff[3],
        "sec": round(time.time() - t2, 1),
        "pass": diff[2] == 0 and diff[3] == 0 and diff[0] > 0}

    report["total_sec"] = round(time.time() - t0, 1)
    report["pass"] = report["soundness"]["pass"] and \
        report["recall_sample"]["pass"]
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    sys.exit(0 if report["pass"] else 1)


if __name__ == "__main__":
    main()
