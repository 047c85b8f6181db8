#!/usr/bin/env python3
"""Decomposed sf1+ oracle for q182_ppjoin (round 15 — completes the
decomposed-oracle tier: after q31 (MinHash-LSH), q30 (n-gram Jaccard),
q33/q52 (SimHash), PPJoin was the last heavy candidate family whose
deep-tier correctness rested on wall-clock measurements + the sf0.01
brute-force oracle + property specs).

DuckDB cannot replay q182 whole at sf1 (the brute-force quadratic
truth is the same blow-up class as the other pair families — the ER
pair oracles already need 1800 s at sf0.1). This checker verifies the
ENGINE'S OUTPUT instead, in the verify_q30_sf1.py two halves:

  (a) SOUNDNESS, exhaustive: for EVERY emitted pair, DuckDB
      independently recomputes both docs' distinct 3-shingle sets from
      the raw text (participants only — linear in output) and asserts
      (1) inter == |sh(a) ∩ sh(b)| exactly, (2) jac_ppm ==
      inter*1e6 // (na + nb - inter) exactly (integer ppm, the q182
      oracle's own formula), (3) jac_ppm >= 700000, (4) id_a < id_b.

  (b) RECALL (and sample precision), exact, on an md5-bottom-N doc
      panel: PPJoin is EXACT by construction (prefix + size +
      positional filters lose nothing), so the truth for panel x panel
      is the full definition replayed — shared-shingle equi-join
      within the panel (a >= 0.7-Jaccard pair must share a shingle),
      exact intersection counts, ppm threshold — and the engine's
      pairs restricted to the panel must equal it EXACTLY, both
      directions. A 1000000*least(na,nb) >= 700000*greatest(na,nb)
      size band (implied by jac >= 0.7, since jac <= min/max) prunes
      the candidate group-bys.

Usage: verify_q182_sf1.py [sfdir] [pairs_parquet] [out_json] [sampleN]
Defaults: /tmp/graft-sf1 /tmp/q182_sf1/q182_ppjoin.parquet
          CORRECTNESS_sf1_q182.json 25000
(Pair density at jac>=0.7 is sparse like q52's — the default panel is
25k; widen at sf10 until truth_pairs > 0 rather than weakening the
assert.)
"""
import json
import os
import sys
import time

import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-sf1"
PAIRS = sys.argv[2] if len(sys.argv) > 2 else \
    "/tmp/q182_sf1/q182_ppjoin.parquet"
OUT = sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_sf1_q182.json"
SAMPLE_N = int(sys.argv[4]) if len(sys.argv) > 4 else 25000

if os.path.isdir(PAIRS):  # Spark writes a directory of part files
    PAIRS = PAIRS.rstrip("/") + "/*.parquet"

T_PPM = 700000  # QueryShared.PpJoinTPpm

# Must match QueryShared.SHINGLES3 / Dedup.shingles(text, 3): DISTINCT
# space-joined 3-token windows; a doc with < 3 tokens contributes its
# whole token string as the single shingle.
SH_FOR = """
WITH toks AS (SELECT doc_id, CASE WHEN length(trim(text))=0
      THEN []::VARCHAR[] ELSE string_split_regex(trim(text),'\\s+') END AS t
    FROM read_parquet('{sfdir}/documents.parquet') {restrict})
SELECT DISTINCT doc_id AS id, unnest(
    CASE WHEN len(t) < 3 THEN [array_to_string(t,' ')]
         ELSE list_transform(generate_series(1, len(t)-2),
                             i -> array_to_string(t[i:i+2],' ')) END) AS sh
FROM toks
"""


def main():
    t0 = time.time()
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    report = {"query": "q182_ppjoin", "sfdir": SFDIR,
              "pairs": PAIRS, "sample_n": SAMPLE_N, "t_ppm": T_PPM}

    n_pairs = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{PAIRS}')").fetchone()[0]
    report["engine_pairs"] = n_pairs

    # (a) SOUNDNESS on every emitted pair: shingle sets restricted to
    # pair participants; intersection recount is pair-local.
    t1 = time.time()
    con.execute(f"""
      CREATE TABLE psh AS
      {SH_FOR.format(sfdir=SFDIR, restrict=
        f"SEMI JOIN (SELECT id_a AS pid FROM read_parquet('{PAIRS}') "
        f"UNION SELECT id_b FROM read_parquet('{PAIRS}')) ON doc_id = pid")}
      """)
    bad = con.execute(f"""
      WITH p AS (SELECT id_a, id_b, inter, jac_ppm
                 FROM read_parquet('{PAIRS}')),
      sizes AS (SELECT id, COUNT(*) AS n FROM psh GROUP BY 1),
      common AS (SELECT p.id_a, p.id_b, COUNT(*) AS c
        FROM p JOIN psh a ON a.id = p.id_a
               JOIN psh b ON b.id = p.id_b AND b.sh = a.sh
        GROUP BY 1, 2),
      chk AS (SELECT p.id_a, p.id_b, p.inter, p.jac_ppm, c.c,
          CAST(c.c * 1000000 // (na.n + nb.n - c.c) AS BIGINT) AS j2
        FROM p JOIN common c ON c.id_a = p.id_a AND c.id_b = p.id_b
               JOIN sizes na ON na.id = p.id_a
               JOIN sizes nb ON nb.id = p.id_b)
      SELECT
        (SELECT COUNT(*) FROM chk
          WHERE inter <> c OR jac_ppm <> j2 OR jac_ppm < {T_PPM})
          AS bad_pair,
        (SELECT COUNT(*) FROM p WHERE id_a >= id_b) AS bad_order,
        (SELECT COUNT(*) FROM (SELECT id_a, id_b FROM p
                               EXCEPT SELECT id_a, id_b FROM common))
          AS no_overlap""").fetchone()
    report["soundness"] = {
        "bad_pair": bad[0], "bad_order": bad[1],
        "pairs_without_overlap": bad[2],
        "sec": round(time.time() - t1, 1),
        "pass": bad[0] == 0 and bad[1] == 0 and bad[2] == 0}

    # (b) RECALL + precision, exact, within the md5-bottom-N panel:
    # truth = the full q182 definition replayed over panel x panel.
    t2 = time.time()
    con.execute(f"""
      CREATE TABLE samp AS
      SELECT doc_id AS id FROM read_parquet('{SFDIR}/documents.parquet')
      ORDER BY md5('q182s_' || CAST(doc_id AS VARCHAR)), doc_id
      LIMIT {SAMPLE_N}""")
    diff = con.execute(f"""
      WITH shs AS ({SH_FOR.format(sfdir=SFDIR, restrict=
                "SEMI JOIN samp ON doc_id = samp.id")}),
      sizes AS (SELECT id, COUNT(*) AS n FROM shs GROUP BY 1),
      common AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS c
        FROM shs a JOIN sizes na ON na.id = a.id
             JOIN shs b ON a.sh = b.sh AND a.id < b.id
             JOIN sizes nb ON nb.id = b.id
        WHERE 1000000 * LEAST(na.n, nb.n) >= {T_PPM} * GREATEST(na.n, nb.n)
        GROUP BY 1, 2),
      truth AS (SELECT id_a, id_b
        FROM common JOIN sizes na ON na.id = id_a
                    JOIN sizes nb ON nb.id = id_b
        WHERE c * 1000000 // (na.n + nb.n - c) >= {T_PPM}),
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
