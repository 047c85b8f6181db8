#!/usr/bin/env python3
"""Decomposed sf1+ oracle for the PPJoin standing-index probes: q218
(create/probe ingest), q305 (fold-in upsert) and q307 (tombstone
delete) — round 15.

CORRECTNESS_sf1_bm25.json gave the BM25 maintenance rows a direct
deep-tier measurement; the PPJoin maintenance rows' deep tier was
"inherited" from the fold==rebuild specs plus the probe family's
decomposed oracles. This checker makes it DIRECT, with the
verify_q182_sf1.py halves applied to the maintenance output:

  (a) SOUNDNESS, exhaustive: for EVERY emitted (new_id, corpus_id)
      pair, DuckDB recomputes both docs' distinct 3-shingle sets from
      raw text and asserts inter and jac_ppm exactly, jac_ppm >=
      700000, new_id in the batch (id%10==0), and the partner in the
      query's own partner domain (q305: anything but self — the
      post-fold index holds corpus AND batch; q307: the tombstone
      survivors, id%10<>0 and id%7<>0).

  (b) RECALL + precision, exact, on an md5-bottom-N panel: the full
      post-maintenance definition replayed over panel x panel (batch
      side x partner side, shared-shingle equi-join, exact ppm
      threshold) must equal the engine's pairs restricted to the panel
      EXACTLY — a fold-in that loses batch x batch pairs, or a delete
      that keeps emitting tombstoned partners, fails here.

Usage: verify_q305_sf1.py <q218|q305|q307> [sfdir] [pairs_parquet]
                          [out_json] [sampleN]
"""
import json
import os
import sys
import time

import duckdb

WHICH = sys.argv[1] if len(sys.argv) > 1 else "q305"
QNAME = {"q218": "q218_ppjoin_ingest",
         "q305": "q305_ppjoin_index_upsert",
         "q307": "q307_ppjoin_index_delete"}[WHICH]
SFDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-sf1"
PAIRS = sys.argv[3] if len(sys.argv) > 3 else \
    f"/tmp/{WHICH}_sf1/{QNAME}.parquet"
OUT = sys.argv[4] if len(sys.argv) > 4 else f"CORRECTNESS_sf1_{WHICH}.json"
SAMPLE_N = int(sys.argv[5]) if len(sys.argv) > 5 else 25000

if os.path.isdir(PAIRS):
    PAIRS = PAIRS.rstrip("/") + "/*.parquet"

T_PPM = 700000  # QueryShared.PpJoinTPpm

# q305 probes the post-FOLD index (standing corpus id%10<>0 plus the
# folded batch id%10==0, i.e. every doc) so the partner domain is
# "anything but self"; q307 probes the post-DELETE index, so partners
# are the tombstone survivors only.
PARTNER_PRED = {"q218": "id % 10 <> 0",
                "q305": "TRUE",
                "q307": "id % 10 <> 0 AND id % 7 <> 0"}[WHICH]
BAD_PARTNER = {"q218": "corpus_id % 10 = 0",
               "q305": "FALSE",
               "q307": "corpus_id % 10 = 0 OR corpus_id % 7 = 0"}[WHICH]

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
    report = {"query": QNAME, "sfdir": SFDIR, "pairs": PAIRS,
              "sample_n": SAMPLE_N, "t_ppm": T_PPM}

    n_pairs = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{PAIRS}')").fetchone()[0]
    report["engine_pairs"] = n_pairs

    # (a) SOUNDNESS on every emitted pair.
    t1 = time.time()
    con.execute(f"""
      CREATE TABLE psh AS
      {SH_FOR.format(sfdir=SFDIR, restrict=
        f"SEMI JOIN (SELECT new_id AS pid FROM read_parquet('{PAIRS}') "
        f"UNION SELECT corpus_id FROM read_parquet('{PAIRS}')) ON doc_id = pid")}
      """)
    bad = con.execute(f"""
      WITH p AS (SELECT new_id, corpus_id, inter, jac_ppm
                 FROM read_parquet('{PAIRS}')),
      sizes AS (SELECT id, COUNT(*) AS n FROM psh GROUP BY 1),
      common AS (SELECT p.new_id, p.corpus_id, COUNT(*) AS c
        FROM p JOIN psh a ON a.id = p.new_id
               JOIN psh b ON b.id = p.corpus_id AND b.sh = a.sh
        GROUP BY 1, 2),
      chk AS (SELECT p.new_id, p.corpus_id, p.inter, p.jac_ppm, c.c,
          CAST(c.c * 1000000 // (na.n + nb.n - c.c) AS BIGINT) AS j2
        FROM p JOIN common c ON c.new_id = p.new_id
                            AND c.corpus_id = p.corpus_id
               JOIN sizes na ON na.id = p.new_id
               JOIN sizes nb ON nb.id = p.corpus_id)
      SELECT
        (SELECT COUNT(*) FROM chk
          WHERE inter <> c OR jac_ppm <> j2 OR jac_ppm < {T_PPM})
          AS bad_pair,
        (SELECT COUNT(*) FROM p
          WHERE new_id % 10 <> 0 OR new_id = corpus_id
             OR ({BAD_PARTNER})) AS bad_domain,
        (SELECT COUNT(*) FROM (SELECT new_id, corpus_id FROM p
                               EXCEPT SELECT new_id, corpus_id FROM common))
          AS no_overlap""").fetchone()
    report["soundness"] = {
        "bad_pair": bad[0], "bad_domain": bad[1],
        "pairs_without_overlap": bad[2],
        "sec": round(time.time() - t1, 1),
        "pass": bad[0] == 0 and bad[1] == 0 and bad[2] == 0}

    # (b) RECALL + precision within the md5-bottom-N panel.
    t2 = time.time()
    con.execute(f"""
      CREATE TABLE samp AS
      SELECT doc_id AS id FROM read_parquet('{SFDIR}/documents.parquet')
      ORDER BY md5('q305s_' || CAST(doc_id AS VARCHAR)), doc_id
      LIMIT {SAMPLE_N}""")
    diff = con.execute(f"""
      WITH shs AS ({SH_FOR.format(sfdir=SFDIR, restrict=
                "SEMI JOIN samp ON doc_id = samp.id")}),
      sizes AS (SELECT id, COUNT(*) AS n FROM shs GROUP BY 1),
      common AS (SELECT a.id AS new_id, b.id AS corpus_id, COUNT(*) AS c
        FROM shs a JOIN sizes na ON na.id = a.id
             JOIN shs b ON a.sh = b.sh AND a.id <> b.id
             JOIN sizes nb ON nb.id = b.id
        WHERE a.id % 10 = 0
          AND ({PARTNER_PRED.replace('id', 'b.id')})
          AND 1000000 * LEAST(na.n, nb.n) >= {T_PPM} * GREATEST(na.n, nb.n)
        GROUP BY 1, 2),
      truth AS (SELECT new_id, corpus_id
        FROM common JOIN sizes na ON na.id = new_id
                    JOIN sizes nb ON nb.id = corpus_id
        WHERE c * 1000000 // (na.n + nb.n - c) >= {T_PPM}),
      eng AS (SELECT new_id, corpus_id FROM read_parquet('{PAIRS}')
        SEMI JOIN samp sa ON new_id = sa.id),
      engs AS (SELECT eng.* FROM eng SEMI JOIN samp sb ON corpus_id = sb.id)
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
