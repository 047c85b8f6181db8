#!/usr/bin/env python3
"""Decomposed sf1+ oracle for q52_dedup_simhash_hamming (VERDICT r14 #4,
the Hamming<=2 sibling of verify_q33_sf1.py).

  (a) SOUNDNESS, exhaustive: for EVERY emitted pair, DuckDB recomputes
      BOTH participants' 60-bit simhashes from the raw text (the exact
      q52 oracle CTEs, participants only -- linear in output) and
      asserts (1) the reported hamming equals bit_count(xor) of the
      recomputation, (2) hamming <= 2, (3) id_a < id_b.

  (b) RECALL, exact, on an md5-bottom-N subsample, replaying the full
      q52 semantics INCLUDING the bucket cap: truth = sample pairs with
      hamming <= 2 that share at least one 20-bit band bucket whose
      FULL-CORPUS occupancy is <= 10000 (the cap is corpus-global, so
      the bucket-size table is computed over all docs -- one linear
      3-rows-per-doc pass, the verify_q30 df-table pattern). Must equal
      the engine's pairs restricted to the sample EXACTLY.

Usage: verify_q52_sf1.py [sfdir] [pairs_parquet] [out_json] [sampleN]
Defaults: /tmp/graft-sf1 /tmp/q52_sf1/q52_dedup_simhash_hamming.parquet
          CORRECTNESS_sf1_q52.json 4000
"""
import json
import os
import sys
import time

import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-sf1"
PAIRS = sys.argv[2] if len(sys.argv) > 2 else \
    "/tmp/q52_sf1/q52_dedup_simhash_hamming.parquet"
OUT = sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_sf1_q52.json"
SAMPLE_N = int(sys.argv[4]) if len(sys.argv) > 4 else 4000

if os.path.isdir(PAIRS):
    PAIRS = PAIRS.rstrip("/") + "/*.parquet"

# Must match QueryShared.TOKS / duckHash(w, 15) / SimHashBitsQ52 = 60 /
# Dedup.simHashBands(60, 2) = three 20-bit chunks / the q52 oracle CTEs.
NBITS = 60
BANDS = [(0, 0, 20), (1, 20, 20), (2, 40, 20)]
BAND_CASE = " ".join(
    f"WHEN {i} THEN (sh >> {start}) & {(1 << ln) - 1}"
    for i, start, ln in BANDS)

SIMHASH_FOR = f"""
WITH w AS (SELECT doc_id AS id, unnest(CASE WHEN length(trim(text))=0
      THEN []::VARCHAR[] ELSE string_split_regex(trim(text),'\\s+') END) AS w
    FROM read_parquet('{{sfdir}}/documents.parquet') {{restrict}}),
 h AS (SELECT id, CAST(concat('0x', substr(md5(w),1,15)) AS BIGINT) AS h FROM w),
 bits AS (SELECT id, bit,
    SUM(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
   FROM h CROSS JOIN (SELECT unnest(generate_series(0,{NBITS - 1})) AS bit) b
   GROUP BY 1, 2)
SELECT id, CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit)
                         ELSE 0 END) AS BIGINT) AS sh
FROM bits GROUP BY 1
"""


def main():
    t0 = time.time()
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    report = {"query": "q52_dedup_simhash_hamming", "sfdir": SFDIR,
              "pairs": PAIRS, "sample_n": SAMPLE_N}

    report["engine_pairs"] = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{PAIRS}')").fetchone()[0]

    # Full-corpus band-bucket occupancy: the cap (<= 10000) is
    # corpus-global -- ONE linear pass, 3 rows per doc, no join.
    con.execute(f"""
      CREATE TABLE bsz AS
      WITH shs AS ({SIMHASH_FOR.format(sfdir=SFDIR, restrict="")}),
      b AS (SELECT id, chunk, CASE chunk {BAND_CASE} END AS key
        FROM shs CROSS JOIN (SELECT unnest(generate_series(0,2)) AS chunk) c)
      SELECT chunk, key, COUNT(*) AS n FROM b GROUP BY 1, 2""")
    report["corpus_band_buckets"] = con.execute(
        "SELECT COUNT(*) FROM bsz").fetchone()[0]
    report["bucket_pass_sec"] = round(time.time() - t0, 1)

    # (a) SOUNDNESS on every emitted pair.
    t1 = time.time()
    con.execute(f"""
      CREATE TABLE psh AS
      {SIMHASH_FOR.format(sfdir=SFDIR, restrict=
        f"SEMI JOIN (SELECT id_a AS pid FROM read_parquet('{PAIRS}') "
        f"UNION SELECT id_b FROM read_parquet('{PAIRS}')) ON doc_id = pid")}
      """)
    bad = con.execute(f"""
      WITH p AS (SELECT id_a, id_b, hamming FROM read_parquet('{PAIRS}'))
      SELECT
        (SELECT COUNT(*) FROM p JOIN psh a ON a.id = p.id_a
                               JOIN psh b ON b.id = p.id_b
          WHERE CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) <> p.hamming
             OR p.hamming > 2) AS bad_hamming,
        (SELECT COUNT(*) FROM p WHERE id_a >= id_b) AS bad_order,
        (SELECT COUNT(*) FROM (
           SELECT id_a AS pid FROM p UNION SELECT id_b FROM p
           EXCEPT SELECT id FROM psh)) AS participants_without_hash
      """).fetchone()
    report["soundness"] = {
        "bad_hamming": bad[0], "bad_order": bad[1],
        "participants_without_hash": bad[2],
        "sec": round(time.time() - t1, 1),
        "pass": bad[0] == 0 and bad[1] == 0 and bad[2] == 0}

    # (b) RECALL + precision within the md5-bottom-N sample, cap
    # semantics included.
    t2 = time.time()
    con.execute(f"""
      CREATE TABLE samp AS
      SELECT doc_id AS id FROM read_parquet('{SFDIR}/documents.parquet')
      ORDER BY md5('q52s_' || CAST(doc_id AS VARCHAR)), doc_id
      LIMIT {SAMPLE_N}""")
    diff = con.execute(f"""
      WITH shs AS ({SIMHASH_FOR.format(sfdir=SFDIR, restrict=
                "SEMI JOIN samp ON doc_id = samp.id")}),
      b AS (SELECT id, sh, chunk, CASE chunk {BAND_CASE} END AS key
        FROM shs CROSS JOIN (SELECT unnest(generate_series(0,2)) AS chunk) c),
      bk AS (SELECT b.* FROM b JOIN bsz ON b.chunk = bsz.chunk
             AND b.key = bsz.key WHERE bsz.n <= 10000),
      truth AS (SELECT DISTINCT a.id AS id_a, b2.id AS id_b
        FROM bk a JOIN bk b2 ON a.chunk = b2.chunk AND a.key = b2.key
          AND a.id < b2.id
        WHERE bit_count(xor(a.sh, b2.sh)) <= 2),
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
