#!/usr/bin/env python3
"""Deterministic scale-up generator for the test corpus.

Produces an sf=<factor x source> dataset with the same schema and the
same distributional shape as the driver-generated testdata
(TESTDATA.md), so the scaling guard can measure wall-clock one decade
above the shipped sf0.1 without touching the read-only testdata tree.

Method, per table:
- region/nation: copied verbatim (fixed-cardinality dimensions, as in
  TPC-H at every scale factor).
- customer/supplier/part/orders/lineitem/events: replicated
  ``factor`` times with every primary/foreign key shifted by
  ``copy * (max_key + 1)`` — referential integrity holds within each
  copy, join fan-outs stay constant, group cardinalities scale
  linearly (more users/orders over the same date window, i.e. a
  denser business, which is how a real 10x looks).
- documents: freshly sampled from the EMPIRICAL word frequencies and
  doc-length distribution of the source corpus (same vocabulary, same
  lang/source marginals), with a matching ~0.2% exact-duplicate rate —
  replication would give every doc ``factor - 1`` identical twins and
  turn the dedup benches into a different (quadratic-cluster)
  workload.
- embeddings: unit vectors with the source's weak label-cluster
  structure (cos-to-centroid ~ 0.08), labels uniform over the
  observed label set.

Everything is seeded — same (src, factor, seed) => byte-identical
output (modulo parquet encoder nondeterminism in row-group layout).

Usage:
    python tools/gen_sf.py --src /root/testdata/sf0.1 --out /tmp/sf1 \
        --factor 10 [--seed 42]
"""

from __future__ import annotations

import argparse
import collections
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SHIFT_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
COPY_TABLES = ["region", "nation"]


def _strides(con, src: str) -> dict[str, int]:
    """One stride per key FAMILY (o_custkey must shift by the
    customer-table stride so FKs keep landing on real PKs)."""
    def mx(table, col):
        return con.execute(
            f"SELECT max({col}) FROM read_parquet('{src}/{table}.parquet')"
        ).fetchone()[0] + 1

    return {
        "custkey": mx("customer", "c_custkey"),
        "suppkey": mx("supplier", "s_suppkey"),
        "partkey": mx("part", "p_partkey"),
        "orderkey": mx("orders", "o_orderkey"),
        "event_id": mx("events", "event_id"),
        "user_id": mx("events", "user_id") + 1,
    }


_KEY_FAMILY = {
    "c_custkey": "custkey", "o_custkey": "custkey",
    "s_suppkey": "suppkey", "l_suppkey": "suppkey",
    "p_partkey": "partkey", "l_partkey": "partkey",
    "o_orderkey": "orderkey", "l_orderkey": "orderkey",
    "event_id": "event_id", "user_id": "user_id",
}


def replicate(con, src: str, out: str, table: str, factor: int) -> int:
    cols = [
        r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{table}.parquet')"
        ).fetchall()
    ]
    strides = _strides(con, src)
    shifted = SHIFT_KEYS[table]
    proj = ", ".join(
        f"({c} + __copy * {strides[_KEY_FAMILY[c]]})::BIGINT AS {c}"
        if c in shifted else c
        for c in cols
    )
    con.execute(
        f"""
        COPY (
            SELECT {proj}
            FROM read_parquet('{src}/{table}.parquet')
            CROSS JOIN (SELECT unnest(range({factor})) AS __copy)
            ORDER BY __copy
        ) TO '{out}/{table}.parquet' (FORMAT PARQUET)
        """
    )
    return con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')"
    ).fetchone()[0]


def gen_documents(con, src: str, out: str, factor: int, seed: int) -> int:
    rows = con.execute(
        f"SELECT text, lang, source FROM read_parquet('{src}/documents.parquet')"
    ).fetchall()
    rng = np.random.default_rng(seed)
    freq: collections.Counter = collections.Counter()
    lengths = []
    for text, _, _ in rows:
        ws = text.split(" ")
        freq.update(ws)
        lengths.append(len(ws))
    vocab = np.array(sorted(freq))
    probs = np.array([freq[w] for w in vocab], dtype=float)
    probs /= probs.sum()
    langs, lang_n = np.unique([r[1] for r in rows], return_counts=True)
    srcs, src_n = np.unique([r[2] for r in rows], return_counts=True)
    n = len(rows) * factor
    lens = rng.choice(np.array(lengths), size=n)
    texts = [
        " ".join(rng.choice(vocab, size=ln, p=probs)) for ln in lens
    ]
    # matching exact-duplicate rate (~0.2% of docs repeat another doc)
    n_dup = max(1, n // 500)
    dst = rng.choice(n, size=n_dup, replace=False)
    src_idx = rng.choice(n, size=n_dup)
    for d, s in zip(dst, src_idx):
        if d != s:
            texts[d] = texts[s]
    tbl = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": texts,
        "lang": rng.choice(langs, size=n, p=lang_n / lang_n.sum()),
        "source": rng.choice(srcs, size=n, p=src_n / src_n.sum()),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    })
    pq.write_table(tbl, f"{out}/documents.parquet")
    return n


def gen_embeddings(con, src: str, out: str, factor: int, seed: int) -> int:
    rows = con.execute(
        f"SELECT label, embedding FROM read_parquet('{src}/embeddings.parquet')"
    ).fetchall()
    rng = np.random.default_rng(seed + 1)
    dim = len(rows[0][1])
    labels = sorted({r[0] for r in rows})
    cents = {}
    for lab in labels:
        vs = np.array([r[1] for r in rows if r[0] == lab])
        c = vs.mean(axis=0)
        cents[lab] = c / np.linalg.norm(c)
    n = len(rows) * factor
    lab = rng.choice(np.array(labels), size=n)
    g = rng.standard_normal((n, dim))
    # cos-to-centroid ~ 0.08, matching the source's weak clustering
    beta = 0.08 * np.sqrt(dim)
    cent = np.stack([cents[int(v)] for v in lab])
    v = g + beta * cent
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.array(
            [row.astype(np.float32) for row in v],
            type=pa.list_(pa.float32()),
        ),
        "label": pa.array([int(x) for x in lab], type=pa.int32()),
    })
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{args.src}/{t}.parquet')) "
            f"TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied")
    for t in SHIFT_KEYS:
        print(t, replicate(con, args.src, args.out, t, args.factor), "rows")
    print("documents",
          gen_documents(con, args.src, args.out, args.factor, args.seed),
          "rows")
    print("embeddings",
          gen_embeddings(con, args.src, args.out, args.factor, args.seed),
          "rows")


if __name__ == "__main__":
    main()
