#!/usr/bin/env python3
"""Generate sf1 testdata (~10x sf0.1) for the scaling-curve run.

The driver ships sf{0.001,0.01,0.1} only (TESTDATA.md, read-only), so the
sf1 layer is synthesized here by structure-preserving replication of
sf0.1, keeping every distributional property the queries depend on:

- region/nation: fixed-size dimensions, copied verbatim.
- customer/supplier/part/orders/lineitem/events: 10 replicas with key
  offsets (replica i shifts each key space by i*max), so FK fan-outs,
  value distributions, and the time span stay identical while
  cardinality scales 10x -- the same shape TPC-H scaling has (fixed
  date range, denser facts, more entities).
- documents: 10 replicas; replica 0 verbatim, replicas i>=1 get a
  per-replica salt token injected every 3 words. Within a replica the
  planted near-dup structure is preserved exactly (both members of a
  pair are salted identically), while across replicas the word-3-shingle
  Jaccard of a doc vs its own copy drops to ~0.14 (<< the 0.5
  threshold) and every word-8-gram is broken -- so near-dup pairs,
  cluster sizes, and contamination hits scale LINEARLY like an organic
  corpus, instead of every doc acquiring 9 exact twins (which would
  quadratically inflate the pair joins into an unrealistic stress test).
- embeddings: sf0.01->sf0.1 grew 4x (500->2000), so sf1 gets 4x = 8000:
  replica 0 verbatim plus 3 replicas of fresh seeded unit-normalized
  gaussian vectors -- the measured marginal distribution of the driver
  data (unit norms, cluster labels uncorrelated with geometry).

Deterministic (fixed seeds), writes one parquet per table to
testdata-sf1/ (gitignored).
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
# r14: replica count / emb replicas / dst are env-overridable so the same
# structure-preserving scheme yields intermediate SFs (VERDICT r13 #5:
# hash-gate the sf1-unverifiable entries at ~sf0.3 where their DuckDB
# oracles are tractable): GEN_SF_REPLICAS=3 GEN_SF_EMB_REPLICAS=2
# GEN_SF_DST=testdata-sf03 -> ~3x sf0.1. Defaults unchanged (sf1).
REPLICAS = int(os.environ.get("GEN_SF_REPLICAS", "10"))
EMB_REPLICAS = int(os.environ.get("GEN_SF_EMB_REPLICAS", "4"))
DST = os.environ.get(
    "GEN_SF_DST",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "testdata-sf1"))


def read(name):
    return pq.read_table(f"{SRC}/{name}.parquet")


def write(name, table):
    os.makedirs(DST, exist_ok=True)
    # drop the pandas metadata blob; keep the arrow schema (incl. ns/ms
    # timestamp units the Spark/DuckDB readers depend on)
    table = table.replace_schema_metadata(None)
    pq.write_table(table, f"{DST}/{name}.parquet")
    print(f"{name}: {table.num_rows} rows")


def shifted(table, offsets, i):
    """Replica i of `table` with key columns shifted by i*offset."""
    cols = {}
    for c in table.column_names:
        col = table.column(c)
        if c in offsets:
            col = pc.add(col, pa.scalar(offsets[c] * i, type=col.type))
        cols[c] = col
    return pa.table(cols, schema=table.schema)


def replicate(name, offsets, n=REPLICAS, names=None):
    src = read(name)
    parts = []
    for i in range(n):
        t = shifted(src, offsets, i)
        if names:  # regenerate entity names from the shifted key
            for col, (keycol, fmt) in names.items():
                keys = t.column(keycol).to_pylist()
                arr = pa.array([fmt % k for k in keys], type=pa.string())
                t = t.set_column(t.column_names.index(col), col, arr)
        parts.append(t)
    write(name, pa.concat_tables(parts))


def salt_text(text, token):
    words = text.split(" ")
    out = []
    for j, w in enumerate(words):
        if j and j % 3 == 0:
            out.append(token)
        out.append(w)
    return " ".join(out)


def documents():
    src = read("documents")
    n_docs = src.num_rows
    texts = src.column("text").to_pylist()
    parts = [src]
    for i in range(1, REPLICAS):
        tok = f"zz{i}q"
        salted = [salt_text(t, tok) for t in texts]
        t = pa.table({
            "doc_id": pc.add(src.column("doc_id"),
                             pa.scalar(n_docs * i, type=pa.int64())),
            "text": pa.array(salted, type=pa.string()),
            "lang": src.column("lang"),
            "source": src.column("source"),
            "n_chars": pa.array([len(s) for s in salted], type=pa.int64()),
        }, schema=src.schema)
        parts.append(t)
    write("documents", pa.concat_tables(parts))


def embeddings():
    src = read("embeddings")
    n, dim = src.num_rows, len(src.column("embedding")[0])
    parts = [src]
    for i in range(1, EMB_REPLICAS):
        rng = np.random.default_rng(4242 + i)
        vecs = rng.standard_normal((n, dim))
        vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
        t = pa.table({
            "vec_id": pc.add(src.column("vec_id"),
                             pa.scalar(n * i, type=pa.int64())),
            "embedding": pa.array(list(vecs),
                                  type=src.schema.field("embedding").type),
            "label": pa.array(rng.integers(0, 10, n),
                              type=src.schema.field("label").type),
        }, schema=src.schema)
        parts.append(t)
    write("embeddings", pa.concat_tables(parts))


def main():
    for name in ("region", "nation"):
        write(name, read(name))
    replicate("customer", {"c_custkey": 15000},
              names={"c_name": ("c_custkey", "Customer#%09d")})
    replicate("supplier", {"s_suppkey": 1000},
              names={"s_name": ("s_suppkey", "Supplier#%09d")})
    replicate("part", {"p_partkey": 20000})
    replicate("orders", {"o_orderkey": 150000, "o_custkey": 15000})
    replicate("lineitem", {"l_orderkey": 150000, "l_partkey": 20000,
                           "l_suppkey": 1000})
    replicate("events", {"event_id": 100000, "user_id": 1500})
    documents()
    embeddings()
    print(f"done -> {DST}")


if __name__ == "__main__":
    main()
