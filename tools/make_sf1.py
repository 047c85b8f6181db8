#!/usr/bin/env python3
"""Derive a measured-scale sf1 fixture (10x sf0.1) at /tmp/graft-sf1.

The driver generates testdata only up to sf0.1; BASELINE.md's "engine
overtakes DuckDB one decade up" claim needs a measured point
(VERDICT r05 #3). This derives sf1 from sf0.1 such that PER-COPY
workload density is exactly the original corpus's, and copies do not
interact:

- TPC-H-ish tables: 10 copies with every key shifted by
  copy * (max_key + 1) of its own domain, foreign keys shifted by the
  referenced table's stride — each copy is a self-consistent key
  universe, so per-key group sizes and join fan-outs are IDENTICAL to
  sf0.1 while table sizes grow 10x. region/nation stay fixed (as in
  real TPC-H, dimension tables do not scale).
- documents: copy i > 0 applies a rot-i substitution cipher over [a-z]
  (the corpus alphabet is exactly [a-z ]): a bijection on characters
  preserves every string length and every equality/inequality relation
  within the copy — shingle sets, shared-substring spans, minhash/
  simhash collision structure are all bit-equivalent modulo relabeling
  — while across copies no gram can match (any 40-char window contains
  letters). A suffix-per-token variant was tried first and REJECTED
  measured: +30% doc length pushed sub-threshold shared spans over
  q125's 40-char line, inflating sf1 span counts 5x beyond linear.
- embeddings: copy i > 0 multiplies every vector elementwise by a
  copy-specific Rademacher +-1 pattern — within-copy dot products and
  norms are bit-preserved (sign flips cancel), cross-copy cosines
  decorrelate, so near-dup pair counts scale linearly.
- events: 10 copies, event_id/user_id shifted; the TIMESTAMP_NANOS
  physical type is preserved via pyarrow (the Spark reader's
  nanosAsLong path depends on it).

Deterministic (seeded); rerun-safe. Usage: make_sf1.py [src] [dst] [K]
K=100 derives a TWO-decade (sf10) fixture from sf0.1 — document
ciphers switch from rot-i to seeded derangements past copy 26 (rots
repeat mod 26); everything else (key strides, Rademacher flips) is
K-agnostic.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10


def read(name):
    return pq.read_table(f"{SRC}/{name}.parquet")


def write(name, table):
    # Bounded row groups: a single-row-group file is unsplittable to
    # Spark (byte-range splits collapse onto the one group's midpoint),
    # which serialized every documents-heavy sf10 query onto ONE core —
    # q86 measured 15x/decade purely from that. A real corpus at this
    # tier ships thousands of row groups; 10K-row groups restore that
    # shape (sf1 docs -> 5 groups, sf10 -> 50).
    pq.write_table(table, f"{DST}/{name}.parquet", row_group_size=10_000)
    print(f"{name:12s} {table.num_rows:>9,} rows")


def stride(table, key):
    return int(np.max(table[key].to_numpy())) + 1


def replicate(table, shifts):
    """shifts: {col: stride}; copy i adds i*stride to each listed col."""
    copies = []
    for i in range(K):
        t = table
        for col, s in shifts.items():
            idx = t.schema.get_field_index(col)
            shifted = pa.array(t[col].to_numpy() + i * s, type=t.schema.field(col).type)
            t = t.set_column(idx, t.schema.field(col), shifted)
        copies.append(t)
    return pa.concat_tables(copies)


def main():
    os.makedirs(DST, exist_ok=True)
    for name in ("region", "nation"):
        write(name, read(name))

    cust, supp, part = read("customer"), read("supplier"), read("part")
    orders, lineitem = read("orders"), read("lineitem")
    C, S, P, O = (stride(cust, "c_custkey"), stride(supp, "s_suppkey"),
                  stride(part, "p_partkey"), stride(orders, "o_orderkey"))
    cust10 = replicate(cust, {"c_custkey": C})
    # c_name is a pure function of the key in TPC-H ("Customer#%09d");
    # rebuild it from the SHIFTED key so copies stay non-interacting —
    # repeated names made every name a 10-member duplicate group and
    # q121's ed<=1 pair output grew ~100x (a fixture artifact, not a
    # plan property)
    names = pa.array(["Customer#%09d" % k
                      for k in cust10["c_custkey"].to_numpy()],
                     type=pa.string())
    cust10 = cust10.set_column(cust10.schema.get_field_index("c_name"),
                               cust10.schema.field("c_name"), names)
    write("customer", cust10)
    write("supplier", replicate(supp, {"s_suppkey": S}))
    write("part", replicate(part, {"p_partkey": P}))
    write("orders", replicate(orders, {"o_orderkey": O, "o_custkey": C}))
    write("lineitem", replicate(
        lineitem, {"l_orderkey": O, "l_partkey": P, "l_suppkey": S}))

    ev = read("events")
    write("events", replicate(
        ev, {"event_id": stride(ev, "event_id"),
             "user_id": stride(ev, "user_id")}))

    docs = read("documents")
    D = stride(docs, "doc_id")
    texts = docs["text"].to_pylist()
    lower = "abcdefghijklmnopqrstuvwxyz"

    def cipher(i):
        """Letter bijection for copy i. rot-i for i < 26 (keeps the
        sf1 fixture bit-identical to earlier rounds); beyond 26 rots
        repeat mod 26 (copies would interact), so higher copies use a
        seeded random DERANGEMENT of the alphabet — no fixed points,
        so no same-source gram survives translation; two independent
        random perms agreeing on a 15-gram's ~10 distinct letters is
        ~26^-10 (and the sf10 build is verified empirically: q130's
        self-span count must be exactly K x sf0.1's)."""
        if i < 26:
            return str.maketrans(lower, lower[i:] + lower[:i])
        rng = np.random.RandomState(7000 + i)
        while True:
            p = rng.permutation(26)
            if not np.any(p == np.arange(26)):
                return str.maketrans(lower, "".join(lower[j] for j in p))

    doc_copies = []
    for i in range(K):
        if i == 0:
            t = docs
        else:
            rot = cipher(i)
            t = docs.set_column(docs.schema.get_field_index("text"),
                                docs.schema.field("text"),
                                pa.array([s.translate(rot) for s in texts],
                                         type=pa.string()))
        t = t.set_column(t.schema.get_field_index("doc_id"),
                         t.schema.field("doc_id"),
                         pa.array(t["doc_id"].to_numpy() + i * D, type=pa.int64()))
        doc_copies.append(t)  # lengths preserved: n_chars stays valid
    write("documents", pa.concat_tables(doc_copies))

    emb = read("embeddings")
    V = stride(emb, "vec_id")
    vecs = np.array(emb["embedding"].to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]
    emb_copies = []
    for i in range(K):
        if i == 0:
            v = vecs
        else:
            signs = np.random.RandomState(1000 + i).choice(
                np.array([-1.0, 1.0], dtype=np.float32), size=dim)
            v = vecs * signs
        t = emb.set_column(emb.schema.get_field_index("embedding"),
                           emb.schema.field("embedding"),
                           pa.array(list(v), type=emb.schema.field("embedding").type))
        t = t.set_column(t.schema.get_field_index("vec_id"),
                         t.schema.field("vec_id"),
                         pa.array(t["vec_id"].to_numpy() + i * V, type=pa.int64()))
        emb_copies.append(t)
    write("embeddings", pa.concat_tables(emb_copies))


if __name__ == "__main__":
    main()
