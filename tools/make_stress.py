#!/usr/bin/env python
"""Regenerable scale-stress datasets (BASELINE.md scaling studies).

Round 1 built these ad hoc and lost the generator with the box; this
script is the committed source of truth so every round can re-measure
on identical data.

- ``sfx`` (text/embedding stress): documents x100 — each replica k
  prefixes every word with ``r{k}`` so shingle spaces stay disjoint and
  the duplicate RATE scales linearly (the honest model of a bigger
  corpus, not one giant duplicate cluster); embeddings x10 — replica k
  shifts every dim by +0.0017*k (near-duplicates with controlled
  distance, the adversarial case for hyperplane LSH bucketing).
- ``sfy`` (relational stress): lineitem/orders/events x10 by key-offset
  replication (keys stay unique, FK structure preserved); dims copied.

Usage: python tools/make_stress.py [--src /root/testdata/sf0.1]
                                   [--sfx /tmp/sfx] [--sfy /tmp/sfy]
"""

from __future__ import annotations

import argparse
import os

import duckdb


def make_sfx(src: str, out: str, *, doc_reps: int = 100, emb_reps: int = 10) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT d.doc_id + 1000000 * r.k AS doc_id,
                 CASE WHEN r.k = 0 THEN d.text
                      ELSE 'r' || r.k || regexp_replace(d.text, ' ', ' r' || r.k, 'g')
                 END AS text,
                 d.lang, d.source, d.n_chars
          FROM '{src}/documents.parquet' d
          CROSS JOIN (SELECT unnest(range({doc_reps})) AS k) r
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT e.vec_id + 1000000 * r.k AS vec_id,
                 CAST(list_transform(e.embedding, x -> x + 0.0017 * r.k)
                      AS FLOAT[]) AS embedding,
                 e.label
          FROM '{src}/embeddings.parquet' e
          CROSS JOIN (SELECT unnest(range({emb_reps})) AS k) r
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)
    # small tables pass through so catalog loads resolve
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )


def make_sfdup(src: str, out: str, *, n: int = 30000, dim: int = 64) -> None:
    """Degenerate mega-bucket stress: ``n`` near-identical embeddings.

    Every vector is the same fixed base (dim i -> 0.5 + i/dim, all
    hyperplane dots safely away from zero) plus a 1e-6 * row jitter, so
    ALL rows land in ONE bucket in EVERY band of the hyperplane LSH —
    the worst case ``lsh_candidate_pairs``'s over-cap branch exists
    for. A quadratic bucket expansion here is n^2/2 = 450M pairs; the
    capped window chain must emit only the adjacent chain (n-1 pairs
    per band) and stream through the spillable window buffer.
    """
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    base = ", ".join(f"{0.5 + i / dim:.6f} + 0.000001 * v.k" for i in range(dim))
    con.execute(f"""
        COPY (
          SELECT v.k AS vec_id,
                 CAST([{base}] AS FLOAT[]) AS embedding,
                 CAST(0 AS INTEGER) AS label  -- keep schema identical to
                 -- the canonical embeddings table (label INTEGER), so
                 -- label-aggregating queries behave the same on sfdup
          FROM (SELECT unnest(range({n})) AS k) v
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents"):
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )


def make_sfclique(
    out: str,
    *,
    n_bases: int = 120_000,
    reps: int = 5,
    mega: int = 50_000,
    dim: int = 64,
    shift: float = 1e-5,
    seed: int = 97,
) -> None:
    """Dup-heavy SKEWED clique corpus with analytic ground truth (r08
    verdict #3): ``n_bases`` gaussian bases × ``reps`` near-identical
    replicas (+shift·k per dim — the sf2m receipt construction, clique-
    style per the corpus invariant: independent bases never drift
    toward a common direction) PLUS one mega-cluster of ``mega``
    near-identical rows (sfdup pattern, ids in a disjoint high range).

    Truth at cosine >= 0.9: every same-base pair (n_bases × C(reps,2))
    and every mega pair; cross-base cosines are ~N(0, 1/dim), so a
    false pair needs a ~7-sigma-squared tail — probability ~1e-12 per
    pair, ~0 over the corpus. The mega bucket is over LSH_MAX_BUCKET_
    SIZE in every band, so the chain contract emits exactly mega-1
    intra-mega pairs; total expected = n_bases*C(reps,2) + mega - 1.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(seed)
    bases = rng.standard_normal((n_bases, dim))
    n = n_bases * reps
    mat = np.repeat(bases, reps, axis=0)
    k = np.tile(np.arange(reps), n_bases)[:, None]
    mat = (mat + shift * k).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    if mega:
        mega_base = 0.5 + np.arange(dim) / dim
        mega_mat = (
            mega_base[None, :] + 1e-6 * np.arange(mega)[:, None] / mega
        ).astype(np.float32)
        mat = np.vstack([mat, mega_mat])
        ids = np.concatenate([ids, 1_000_000_000 + np.arange(mega, dtype=np.int64)])
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.ravel(), pa.float32()), dim
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(np.zeros(len(ids), dtype=np.int32), pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out}/embeddings.parquet")


def make_sfy(src: str, out: str, *, reps: int = 10) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    rep = f"CROSS JOIN (SELECT unnest(range({reps})) AS k) r"
    con.execute(f"""
        COPY (
          SELECT l_orderkey + 10000000 * r.k AS l_orderkey, l_partkey, l_suppkey,
                 l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
                 l_returnflag, l_linestatus, l_shipdate
          FROM '{src}/lineitem.parquet' {rep}
        ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT o_orderkey + 10000000 * r.k AS o_orderkey, o_custkey,
                 o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM '{src}/orders.parquet' {rep}
        ) TO '{out}/orders.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT event_id + 100000000 * r.k AS event_id, ts, user_id,
                 event_type, value, props
          FROM '{src}/events.parquet' {rep}
        ) TO '{out}/events.parquet' (FORMAT PARQUET)
    """)
    for t in ("region", "nation", "customer", "supplier", "part",
              "documents", "embeddings"):
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--sfx", default="/tmp/sfx")
    ap.add_argument("--sfy", default="/tmp/sfy")
    ap.add_argument("--sfdup", default=None,
                    help="also write the mega-bucket dup stress here")
    args = ap.parse_args()
    make_sfx(args.src, args.sfx)
    make_sfy(args.src, args.sfy)
    if args.sfdup:
        make_sfdup(args.src, args.sfdup)
    print("wrote", args.sfx, "and", args.sfy,
          *([args.sfdup] if args.sfdup else []))
