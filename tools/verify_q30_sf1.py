#!/usr/bin/env python3
"""Decomposed sf1+ oracle for q30_dedup_ngram_jaccard (VERDICT r13 #8).

DuckDB cannot replay q30 whole at sf1 (the shingle-hash self-join is the
same blow-up class as q31's band join), so above sf0.1 the answer rested
on the r12 spot drive alone. This checker verifies the ENGINE'S OUTPUT
instead, in two tractable halves (the verify_q31_sf1.py pattern):

  (a) SOUNDNESS, exhaustive: for EVERY emitted pair, DuckDB
      independently recomputes both docs' distinct 3-shingle 60-bit
      hash sets (participants only — linear in output), the
      full-corpus doc-frequency cap table (one linear pass, no join),
      and asserts (1) the pair shares >= 1 kept (df <= 10000) shingle,
      (2) jaccard = round(c / (n_a + n_b - c), 4) exactly (c over kept
      shingles, sizes over ALL distinct shingles — the engine's
      guarded semantics), (3) jaccard >= 0.05.

  (b) RECALL, on an md5-bottom-N subsample: the full q30 definition
      replayed by DuckDB over sample x sample via the kept-shingle
      equi-join must equal the engine's pairs restricted to the sample
      EXACTLY (recall and precision both).

Usage: verify_q30_sf1.py [sfdir] [pairs_parquet] [out_json] [sampleN]
Defaults: /tmp/graft-sf1 /tmp/q30_sf1/q30_dedup_ngram_jaccard.parquet
          CORRECTNESS_sf1_q30.json 4000
"""
import json
import sys
import time

import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-sf1"
PAIRS = sys.argv[2] if len(sys.argv) > 2 else \
    "/tmp/q30_sf1/q30_dedup_ngram_jaccard.parquet"
OUT = sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_sf1_q30.json"
SAMPLE_N = int(sys.argv[4]) if len(sys.argv) > 4 else 4000

import os
if os.path.isdir(PAIRS):  # Spark writes a directory of part files
    PAIRS = PAIRS.rstrip("/") + "/*.parquet"

# Must match QueryShared.SHINGLES3 / duckHash(sh, 15) / the q30 oracle.
HS_FOR = """
WITH toks AS (SELECT doc_id, CASE WHEN length(trim(text))=0
      THEN []::VARCHAR[] ELSE string_split_regex(trim(text),'\\s+') END AS t
    FROM read_parquet('{sfdir}/documents.parquet') {restrict}),
 sh AS (SELECT DISTINCT doc_id AS id, unnest(
    CASE WHEN len(t) < 3 THEN [array_to_string(t,' ')]
         ELSE list_transform(generate_series(1, len(t)-2),
                             i -> array_to_string(t[i:i+2],' ')) END) AS sh
   FROM toks)
SELECT id, CAST(concat('0x', substr(md5(sh),1,15)) AS BIGINT) AS h FROM sh
"""


def main():
    t0 = time.time()
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    report = {"query": "q30_dedup_ngram_jaccard", "sfdir": SFDIR,
              "pairs": PAIRS, "sample_n": SAMPLE_N}

    n_pairs = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{PAIRS}')").fetchone()[0]
    report["engine_pairs"] = n_pairs

    # Full-corpus doc-frequency table: ONE linear pass (no join) — the
    # cap (df <= 10000) is corpus-global, so it cannot be restricted to
    # participants; everything else can.
    con.execute(f"""
      CREATE TABLE df AS
      SELECT h, COUNT(*) AS d FROM ({HS_FOR.format(sfdir=SFDIR, restrict="")})
      GROUP BY 1""")
    report["corpus_shingle_hashes"] = con.execute(
        "SELECT COUNT(*) FROM df").fetchone()[0]
    report["df_pass_sec"] = round(time.time() - t0, 1)

    # (a) SOUNDNESS on every emitted pair: shingle sets restricted to
    # pair participants; the overlap recomputation is pair-local.
    t1 = time.time()
    con.execute(f"""
      CREATE TABLE phs AS
      {HS_FOR.format(sfdir=SFDIR, restrict=
        f"SEMI JOIN (SELECT id_a AS pid FROM read_parquet('{PAIRS}') "
        f"UNION SELECT id_b FROM read_parquet('{PAIRS}')) ON doc_id = pid")}
      """)
    bad = con.execute(f"""
      WITH p AS (SELECT id_a, id_b, jaccard FROM read_parquet('{PAIRS}')),
      sizes AS (SELECT id, COUNT(*) AS n FROM phs GROUP BY 1),
      common AS (SELECT p.id_a, p.id_b, COUNT(*) AS c
        FROM p JOIN phs a ON a.id = p.id_a
               JOIN phs b ON b.id = p.id_b AND b.h = a.h
               JOIN df ON df.h = a.h AND df.d <= 10000
        GROUP BY 1, 2),
      chk AS (SELECT p.id_a, p.id_b, p.jaccard,
          round(CAST(c.c AS DOUBLE) / (na.n + nb.n - c.c), 4) AS j2
        FROM p JOIN common c ON c.id_a = p.id_a AND c.id_b = p.id_b
               JOIN sizes na ON na.id = p.id_a
               JOIN sizes nb ON nb.id = p.id_b)
      SELECT
        (SELECT COUNT(*) FROM chk
          WHERE j2 <> jaccard OR jaccard < 0.05) AS bad_jaccard,
        (SELECT COUNT(*) FROM (SELECT id_a, id_b FROM p
                               EXCEPT SELECT id_a, id_b FROM common))
          AS no_kept_overlap""").fetchone()
    report["soundness"] = {
        "bad_jaccard": bad[0], "pairs_without_kept_overlap": bad[1],
        "sec": round(time.time() - t1, 1),
        "pass": bad[0] == 0 and bad[1] == 0}

    # (b) RECALL (and sample precision): md5-bottom-N doc sample,
    # truth = the full q30 definition replayed over sample x sample.
    t2 = time.time()
    con.execute(f"""
      CREATE TABLE samp AS
      SELECT doc_id AS id FROM read_parquet('{SFDIR}/documents.parquet')
      ORDER BY md5('q30s_' || CAST(doc_id AS VARCHAR)), doc_id
      LIMIT {SAMPLE_N}""")
    diff = con.execute(f"""
      WITH shs AS ({HS_FOR.format(sfdir=SFDIR, restrict=
                "SEMI JOIN samp ON doc_id = samp.id")}),
      sizes AS (SELECT id, COUNT(*) AS n FROM shs GROUP BY 1),
      kept AS (SELECT shs.* FROM shs JOIN df ON df.h = shs.h
               WHERE df.d <= 10000),
      common AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS c
        FROM kept a JOIN kept b ON a.h = b.h AND a.id < b.id
        GROUP BY 1, 2),
      truth AS (SELECT id_a, id_b
        FROM common JOIN sizes na ON na.id = id_a
                    JOIN sizes nb ON nb.id = id_b
        WHERE round(CAST(c AS DOUBLE) / (na.n + nb.n - c), 4) >= 0.05),
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
