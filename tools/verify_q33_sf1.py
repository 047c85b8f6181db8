#!/usr/bin/env python3
"""Decomposed sf1+ oracle for q33_dedup_simhash (VERDICT r14 #4).

The SimHash family was the one heavy candidate family whose deep-tier
correctness still rested on the r12 whole-query spot drive (q33 PASS at
sf1) plus small-scale property specs. This checker generalizes the
verify_q30_sf1.py pattern to the fingerprint-equality join and runs at
sf1 AND sf10:

  (a) SOUNDNESS, exhaustive: for EVERY emitted pair, DuckDB
      independently recomputes BOTH participants' 16-bit simhashes from
      the raw text (token md5-hash 60-bit, +/-1 per bit, threshold > 0
      -- the exact q33 oracle CTEs, participants only so the pass is
      linear in output) and asserts (1) sh(id_a) == sh(id_b), (2) the
      reported simhash column equals the recomputation, (3) id_a < id_b.

  (b) RECALL, exact, on an md5-bottom-N subsample: simhash is a pure
      per-doc function, so the truth for sample x sample is the
      equality self-join within the sample -- it must equal the
      engine's pairs restricted to the sample EXACTLY (recall and
      precision both; no cap/threshold asymmetry exists for q33).

Usage: verify_q33_sf1.py [sfdir] [pairs_parquet] [out_json] [sampleN]
Defaults: /tmp/graft-sf1 /tmp/q33_sf1/q33_dedup_simhash.parquet
          CORRECTNESS_sf1_q33.json 4000
"""
import json
import os
import sys
import time

import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-sf1"
PAIRS = sys.argv[2] if len(sys.argv) > 2 else \
    "/tmp/q33_sf1/q33_dedup_simhash.parquet"
OUT = sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_sf1_q33.json"
SAMPLE_N = int(sys.argv[4]) if len(sys.argv) > 4 else 4000

if os.path.isdir(PAIRS):  # Spark writes a directory of part files
    PAIRS = PAIRS.rstrip("/") + "/*.parquet"

# Must match QueryShared.TOKS / duckHash(w, 15) / the q33 oracle CTEs
# (16-bit simhash over ALL token occurrences, not distinct).
SIMHASH_FOR = """
WITH w AS (SELECT doc_id AS id, unnest(CASE WHEN length(trim(text))=0
      THEN []::VARCHAR[] ELSE string_split_regex(trim(text),'\\s+') END) AS w
    FROM read_parquet('{sfdir}/documents.parquet') {restrict}),
 h AS (SELECT id, CAST(concat('0x', substr(md5(w),1,15)) AS BIGINT) AS h FROM w),
 bits AS (SELECT id, bit,
    SUM(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
   FROM h CROSS JOIN (SELECT unnest(generate_series(0,15)) AS bit) b
   GROUP BY 1, 2)
SELECT id, CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit)
                         ELSE 0 END) AS BIGINT) AS sh
FROM bits GROUP BY 1
"""


def main():
    t0 = time.time()
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    report = {"query": "q33_dedup_simhash", "sfdir": SFDIR,
              "pairs": PAIRS, "sample_n": SAMPLE_N}

    n_pairs = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{PAIRS}')").fetchone()[0]
    report["engine_pairs"] = n_pairs

    # (a) SOUNDNESS on every emitted pair: simhash recomputed from raw
    # text for pair PARTICIPANTS only -- linear in output.
    t1 = time.time()
    con.execute(f"""
      CREATE TABLE psh AS
      {SIMHASH_FOR.format(sfdir=SFDIR, restrict=
        f"SEMI JOIN (SELECT id_a AS pid FROM read_parquet('{PAIRS}') "
        f"UNION SELECT id_b FROM read_parquet('{PAIRS}')) ON doc_id = pid")}
      """)
    bad = con.execute(f"""
      WITH p AS (SELECT id_a, id_b, simhash FROM read_parquet('{PAIRS}'))
      SELECT
        (SELECT COUNT(*) FROM p JOIN psh a ON a.id = p.id_a
                               JOIN psh b ON b.id = p.id_b
          WHERE a.sh <> b.sh OR a.sh <> p.simhash) AS bad_simhash,
        (SELECT COUNT(*) FROM p WHERE id_a >= id_b) AS bad_order,
        (SELECT COUNT(*) FROM (
           SELECT id_a AS pid FROM p UNION SELECT id_b FROM p
           EXCEPT SELECT id FROM psh)) AS participants_without_hash
      """).fetchone()
    report["soundness"] = {
        "bad_simhash": bad[0], "bad_order": bad[1],
        "participants_without_hash": bad[2],
        "sec": round(time.time() - t1, 1),
        "pass": bad[0] == 0 and bad[1] == 0 and bad[2] == 0}

    # (b) RECALL + precision, exact, within the md5-bottom-N sample.
    t2 = time.time()
    con.execute(f"""
      CREATE TABLE samp AS
      SELECT doc_id AS id FROM read_parquet('{SFDIR}/documents.parquet')
      ORDER BY md5('q33s_' || CAST(doc_id AS VARCHAR)), doc_id
      LIMIT {SAMPLE_N}""")
    diff = con.execute(f"""
      WITH shs AS ({SIMHASH_FOR.format(sfdir=SFDIR, restrict=
                "SEMI JOIN samp ON doc_id = samp.id")}),
      truth AS (SELECT a.id AS id_a, b.id AS id_b
        FROM shs a JOIN shs b ON a.sh = b.sh AND a.id < b.id),
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
