#!/usr/bin/env python3
"""Synthesize an N-times-larger fixture from an existing one, for
SCALE-ARTIFACT TIMING ONLY (never for oracle checks — the driver's
correctness gate stays on the real fixtures).

Usage: mksfx.py <src_sf_dir> <out_dir> [factor]

Replication is designed so per-query WORK scales linearly with the
factor instead of manufacturing quadratic pair blowups that would
misread as engine superlinearity:

- documents: replica i>0 offsets doc_id by i*1e6 and salts every TOKEN
  with a per-replica suffix, so replicas share no shingles / no exact
  hashes / no spans with each other — each replica carries the same
  ORGANIC intra-replica dup structure as the base corpus, and pair
  outputs grow ~linearly. (Queries that split corpus/arrivals on
  doc_id<250 keep a fixed-size corpus side while arrivals grow — the
  production ingest shape; noted in the README table.)
- embeddings: replica i rotates each vector's components by i
  positions, then applies a per-replica deterministic SIGN-FLIP
  pattern (a diagonal +-1 matrix). Both are orthogonal transforms, so
  intra-replica pairwise cosines (and kmeans/ANN geometry) are
  EXACTLY preserved, while cross-replica cosines decorrelate EVEN for
  rotation-invariant vectors (constant or periodic components, for
  which rotation alone is the identity and replicas would otherwise
  stay correlated, re-inflating pair outputs quadratically).
- events: ids/users offset per replica; timestamps unchanged, so
  window/session state grows in keys, not in per-key depth.
- TPC-H tables: fact and dimension keys offset consistently per
  replica (joins stay 1:1 with the base fixture); region/nation stay
  as-is (shared dimensions).
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def rep(table, n, mutate):
    parts = [mutate(table, i) for i in range(n)]
    return pa.concat_tables(parts)


def offset(tbl, col, delta):
    idx = tbl.column_names.index(col)
    return tbl.set_column(idx, col, pc.add(tbl.column(col), delta))


def key_stride(*columns):
    """Per-replica offset for a key family: max observed key + 1, so
    replica ranges can NEVER overlap no matter how large the base
    fixture's (possibly sparse) keys are — a fixed constant would
    silently collide once keys reach it, corrupting the 1:1 join
    structure the replication depends on. Columns sharing a key family
    (o_orderkey/l_orderkey) must use one shared stride."""
    m = max(pc.max(c).as_py() or 0 for c in columns)
    return m + 1


def main():
    src, out = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os
    os.makedirs(out, exist_ok=True)

    def write(name, tbl):
        pq.write_table(tbl, f"{out}/{name}.parquet")
        print(f"{name}: {tbl.num_rows} rows")

    # shared dimensions: unchanged
    for name in ("region", "nation"):
        write(name, pq.read_table(f"{src}/{name}.parquet"))

    # TPC-H: consistent key offsets per replica keep joins 1:1; strides
    # derive from the observed max of each key FAMILY (shared across the
    # fact/dim sides that join on it)
    cust = pq.read_table(f"{src}/customer.parquet")
    supp = pq.read_table(f"{src}/supplier.parquet")
    part = pq.read_table(f"{src}/part.parquet")
    orders = pq.read_table(f"{src}/orders.parquet")
    li = pq.read_table(f"{src}/lineitem.parquet")
    ck = key_stride(cust.column("c_custkey"), orders.column("o_custkey"))
    sk = key_stride(supp.column("s_suppkey"), li.column("l_suppkey"))
    pk = key_stride(part.column("p_partkey"), li.column("l_partkey"))
    ok = key_stride(orders.column("o_orderkey"), li.column("l_orderkey"))
    write("customer", rep(cust, n, lambda t, i: offset(t, "c_custkey", i * ck)))
    write("supplier", rep(supp, n, lambda t, i: offset(t, "s_suppkey", i * sk)))
    write("part", rep(part, n, lambda t, i: offset(t, "p_partkey", i * pk)))
    write("orders", rep(orders, n, lambda t, i: offset(
        offset(t, "o_orderkey", i * ok), "o_custkey", i * ck)))
    write("lineitem", rep(li, n, lambda t, i: offset(offset(offset(
        t, "l_orderkey", i * ok), "l_partkey", i * pk), "l_suppkey", i * sk)))

    ev = pq.read_table(f"{src}/events.parquet")
    ek = key_stride(ev.column("event_id"))
    uk = key_stride(ev.column("user_id"))
    write("events", rep(ev, n, lambda t, i: offset(
        offset(t, "event_id", i * ek), "user_id", i * uk)))

    docs = pq.read_table(f"{src}/documents.parquet")
    dk = key_stride(docs.column("doc_id"))

    def mutate_docs(t, i):
        if i == 0:
            return t
        texts = t.column("text").to_pylist()
        salted = [
            None if x is None else " ".join(f"{w}_{i}" for w in x.split(" "))
            for x in texts]
        arr = pa.array(salted, type=pa.string())
        t = t.set_column(t.column_names.index("text"), "text", arr)
        t = t.set_column(
            t.column_names.index("n_chars"), "n_chars",
            pa.array([len(x) if x is not None else 0 for x in salted],
                     type=pa.int64()))
        return offset(t, "doc_id", i * dk)

    write("documents", rep(docs, n, mutate_docs))

    emb = pq.read_table(f"{src}/embeddings.parquet")

    def mutate_emb(t, i):
        # vec_ids stay DENSE (offset by the base row count, not 1e6):
        # the LA workloads use vec_id as a blocked-matrix row index with
        # nRows = count(), and fromRowVectors rejects sparse ids
        if i == 0:
            return t
        vecs = t.column("embedding").to_pylist()
        # same sign pattern for EVERY vector in the replica (one
        # diagonal +-1 matrix per replica): intra-replica cosines are
        # untouched, cross-replica ones decorrelate even where the
        # rotation is the identity (constant / periodic vectors)
        def signs(dim):
            return [1.0 if ((j * 1315423911 ^ i * 2654435761)
                            >> 13) & 1 == 0 else -1.0
                    for j in range(dim)]
        sign_cache = {}

        def flip(v):
            s = sign_cache.setdefault(len(v), signs(len(v)))
            return [c * sj for c, sj in zip(v, s)]
        rot = [v if not v else flip(v[i % len(v):] + v[:i % len(v)])
               for v in vecs]
        arr = pa.array(rot, type=pa.list_(pa.float32()))
        t = t.set_column(t.column_names.index("embedding"), "embedding", arr)
        return offset(t, "vec_id", i * t.num_rows)

    write("embeddings", rep(emb, n, mutate_emb))


if __name__ == "__main__":
    main()
