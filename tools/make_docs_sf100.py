#!/usr/bin/env python3
"""Derive a THIRD-decade documents fixture (sf100 = K x sf0.1, K=1000)
for the span-family probe (VERDICT r12 #6) — documents ONLY: the span
operators (q125/q126/q130/q131) touch no other table, and replicating
lineitem at K=1000 would burn ~50 GB for nothing.

Same construction as make_sf1.py's documents branch (kept in lockstep):
copy 0 verbatim; copies 1..25 rot-i substitution ciphers; copies >= 26
seeded random DERANGEMENTS of [a-z] — every copy is gram-isomorphic to
sf0.1 (within-copy span structure bit-preserved modulo relabeling) and
cross-copy gram matches are ~26^-10 improbable, so the TRUE span counts
are exactly K x sf0.1's: growth past linear in a measurement is the
ENGINE's, never the fixture's. Bounded row groups (10K rows) keep the
file splittable (the make_sf1.py lesson: a single row group serialized
sf10 onto one core).

Usage: make_docs_sf100.py [src] [dst] [K]
Defaults: /root/testdata/sf0.1 /tmp/graft-sf100 1000
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-sf100"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

LOWER = "abcdefghijklmnopqrstuvwxyz"


def cipher(i):
    """Identical to make_sf1.py's: rot-i under 26, derangement past."""
    if i < 26:
        return str.maketrans(LOWER, LOWER[i:] + LOWER[:i])
    rng = np.random.RandomState(7000 + i)
    while True:
        p = rng.permutation(26)
        if not np.any(p == np.arange(26)):
            return str.maketrans(LOWER, "".join(LOWER[j] for j in p))


def main():
    os.makedirs(DST, exist_ok=True)
    docs = pq.read_table(f"{SRC}/documents.parquet")
    D = int(np.max(docs["doc_id"].to_numpy())) + 1
    texts = docs["text"].to_pylist()
    ids = docs["doc_id"].to_numpy()
    tix = docs.schema.get_field_index("text")
    dix = docs.schema.get_field_index("doc_id")
    # stream copies straight into the writer — never K tables in memory
    out = f"{DST}/documents.parquet"
    writer = None
    for i in range(K):
        t = docs
        if i > 0:
            rot = cipher(i)
            t = t.set_column(tix, t.schema.field("text"),
                             pa.array([s.translate(rot) for s in texts],
                                      type=pa.string()))
        t = t.set_column(dix, t.schema.field("doc_id"),
                         pa.array(ids + i * D, type=pa.int64()))
        if writer is None:
            writer = pq.ParquetWriter(out, t.schema)
        writer.write_table(t, row_group_size=10_000)
    writer.close()
    got = pq.read_metadata(out)
    print(f"documents    {got.num_rows:>11,} rows, "
          f"{got.num_row_groups} row groups -> {out}")


if __name__ == "__main__":
    main()
