#!/usr/bin/env python3
"""Decomposed sf1 oracle for q31_dedup_minhash_lsh (VERDICT r12 #1).

DuckDB cannot replay q31 whole at sf1 (the band self-join spills >80 GB
and times out), so no independent computation had ever confirmed the
engine's answer above sf0.1. This checker verifies the ENGINE'S OUTPUT
instead, in two tractable halves:

  (a) SOUNDNESS, exhaustive: for EVERY emitted pair, DuckDB
      independently recomputes both docs' 16-value MinHash signatures
      (signatures only for docs appearing in pairs — linear in output)
      and asserts (1) the pair collides in >= 1 band whose FULL-corpus
      bucket occupancy respects the 10000 cap (occupancy needs band
      keys for all docs — one linear pass, no join), (2) the estimate
      matches exactly (k/16 values are 4dp-exact in binary, so
      rounding is engine-neutral), (3) est >= 0.25.

  (b) RECALL, on an md5-bottom-N subsample: the LSH definition
      (band-collision + cap + est threshold) replayed by DuckDB over
      sample x sample via a band equi-join of the sample's keys —
      cheap because buckets are small — must equal the engine's pairs
      restricted to the sample EXACTLY (recall and precision both).

Usage: verify_q31_sf1.py [sfdir] [pairs_parquet] [out_json] [sampleN]
Defaults: /tmp/graft-sf1 /tmp/q31_sf1/q31_dedup_minhash_lsh.parquet
          CORRECTNESS_sf1_q31.json 4000
"""
import json
import sys
import time

import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-sf1"
PAIRS = sys.argv[2] if len(sys.argv) > 2 else \
    "/tmp/q31_sf1/q31_dedup_minhash_lsh.parquet"
OUT = sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_sf1_q31.json"
SAMPLE_N = int(sys.argv[4]) if len(sys.argv) > 4 else 4000

# Must match QueryShared.SHINGLES3 / duckHash / the q31 oracle SQL.
MH_FOR = """
WITH toks AS (SELECT doc_id, CASE WHEN length(trim(text))=0
      THEN []::VARCHAR[] ELSE string_split_regex(trim(text),'\\s+') END AS t
    FROM read_parquet('{sfdir}/documents.parquet') {restrict}),
 sh AS (SELECT DISTINCT doc_id AS id, unnest(
    CASE WHEN len(t) < 3 THEN [array_to_string(t,' ')]
         ELSE list_transform(generate_series(1, len(t)-2),
                             i -> array_to_string(t[i:i+2],' ')) END) AS sh
   FROM toks),
 h AS (SELECT id, CAST(concat('0x', substr(md5(sh),1,7)) AS BIGINT) AS h
   FROM sh)
SELECT id, i AS hash_idx,
  min((h*((i*2654435761) % 2147483647 + 1) + i*40503 + 7) % 2147483647)
    AS min_hash
FROM h CROSS JOIN (SELECT unnest(generate_series(0,15)) AS i)
GROUP BY 1, 2
"""


def main():
    t0 = time.time()
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    report = {"query": "q31_dedup_minhash_lsh", "sfdir": SFDIR,
              "pairs": PAIRS, "sample_n": SAMPLE_N}

    n_pairs = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{PAIRS}')").fetchone()[0]
    report["engine_pairs"] = n_pairs

    # Full-corpus band keys + bucket occupancy: ONE linear pass (no
    # join anywhere) — this is what makes the decomposition tractable.
    con.execute(f"""
      CREATE TABLE bk AS
      WITH mh AS ({MH_FOR.format(sfdir=SFDIR, restrict="")})
      SELECT id, hash_idx // 4 AS band,
        md5(string_agg(CAST(min_hash AS VARCHAR), ',' ORDER BY hash_idx))
          AS band_key
      FROM mh GROUP BY 1, 2""")
    con.execute("""
      CREATE TABLE bsz AS
      SELECT band, band_key, COUNT(*) AS n FROM bk GROUP BY 1, 2""")
    report["corpus_docs"] = con.execute(
        "SELECT COUNT(DISTINCT id) FROM bk").fetchone()[0]
    report["sig_pass_sec"] = round(time.time() - t0, 1)

    # (a) SOUNDNESS on every emitted pair. Signatures restricted to
    # pair participants; the band/est recomputation is pair-local.
    t1 = time.time()
    con.execute(f"""
      CREATE TABLE pmh AS
      {MH_FOR.format(sfdir=SFDIR, restrict=
        f"SEMI JOIN (SELECT id_a AS pid FROM read_parquet('{PAIRS}') "
        f"UNION SELECT id_b FROM read_parquet('{PAIRS}')) ON doc_id = pid")}
      """)
    bad = con.execute(f"""
      WITH p AS (SELECT id_a, id_b, est_jaccard
                 FROM read_parquet('{PAIRS}')),
      est AS (SELECT p.id_a, p.id_b, p.est_jaccard,
          round(avg(CASE WHEN ma.min_hash = mb.min_hash
                    THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END), 4)
            AS est2
        FROM p JOIN pmh ma ON ma.id = p.id_a
               JOIN pmh mb ON mb.id = p.id_b AND mb.hash_idx = ma.hash_idx
        GROUP BY 1, 2, 3),
      coll AS (SELECT p.id_a, p.id_b, COUNT(*) AS n_bands
        FROM p JOIN bk a ON a.id = p.id_a
               JOIN bk b ON b.id = p.id_b AND b.band = a.band
                        AND b.band_key = a.band_key
               JOIN bsz ON bsz.band = a.band AND bsz.band_key = a.band_key
                        AND bsz.n <= 10000
        GROUP BY 1, 2)
      SELECT
        (SELECT COUNT(*) FROM est
          WHERE est2 <> est_jaccard OR est_jaccard < 0.25) AS bad_est,
        (SELECT COUNT(*) FROM (SELECT id_a, id_b FROM p
                               EXCEPT SELECT id_a, id_b FROM coll))
          AS uncollided""").fetchone()
    report["soundness"] = {
        "bad_estimates": bad[0], "pairs_without_capped_band_collision": bad[1],
        "sec": round(time.time() - t1, 1),
        "pass": bad[0] == 0 and bad[1] == 0}

    # (b) RECALL (and sample precision): md5-bottom-N doc sample,
    # truth = the LSH definition replayed over sample x sample.
    t2 = time.time()
    con.execute(f"""
      CREATE TABLE samp AS
      SELECT doc_id AS id FROM read_parquet('{SFDIR}/documents.parquet')
      ORDER BY md5('q31s_' || CAST(doc_id AS VARCHAR)), doc_id
      LIMIT {SAMPLE_N}""")
    diff = con.execute(f"""
      WITH sbk AS (SELECT bk.* FROM bk SEMI JOIN samp ON bk.id = samp.id),
      cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM sbk a JOIN sbk b ON a.band = b.band AND a.band_key = b.band_key
                            AND a.id < b.id
             JOIN bsz ON bsz.band = a.band AND bsz.band_key = a.band_key
                      AND bsz.n <= 10000),
      smh AS ({MH_FOR.format(sfdir=SFDIR, restrict=
                "SEMI JOIN samp ON doc_id = samp.id")}),
      truth AS (SELECT c.id_a, c.id_b
        FROM cand c JOIN smh ma ON ma.id = c.id_a
                    JOIN smh mb ON mb.id = c.id_b
                               AND mb.hash_idx = ma.hash_idx
        GROUP BY 1, 2
        HAVING round(avg(CASE WHEN ma.min_hash = mb.min_hash
                  THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END), 4)
               >= 0.25),
      eng AS (SELECT id_a, id_b FROM read_parquet('{PAIRS}')
        SEMI JOIN samp sa ON id_a = sa.id)
      , engs AS (SELECT eng.* FROM eng SEMI JOIN samp sb ON id_b = sb.id)
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
