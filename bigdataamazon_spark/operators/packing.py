"""Sequence packing — concat-and-chunk document→sequence assignment.

The step between a curated corpus and a training run: documents are
concatenated in a deterministic order and cut into fixed-size token
chunks ("sequences"). The reference never gets here (its corpus fits a
single pandas frame, ``/root/reference/amazon1.py:24-29``); at 100 TB
this is a required, shuffle-shaped op.

Scale shape: a single global running sum would serialize the corpus
through one window partition. Instead the corpus is split into
``n_shards`` deterministic shards (hash of the doc key) and packed
independently per shard — the window partitions by shard, so packing
parallelism equals shard count and each task streams its shard once.
Real pipelines do exactly this (each writer task packs its own shard);
the only cost is ≤1 partially-filled chunk per shard. Everything is
native window + agg — no UDF, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def greedy_pack(
    df: DataFrame,
    seq_len: int = 512,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each doc to the chunk where its first token lands.

    Within a shard, docs are laid out in ``id_col`` order; a doc whose
    cumulative start offset falls in ``[k·seq_len, (k+1)·seq_len)``
    belongs to pack ``k`` (concat-and-chunk: a doc may straddle the
    boundary into pack ``k+1`` — token-level splitting is the
    tokenizer's job downstream, the engine decides placement).

    Returns one row per (shard, pack): doc count, token sum, and the
    doc-id range, i.e. the manifest a writer task needs to materialize
    the pack.
    """
    n_tok = F.size(tokens(F.col(text_col)))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        n_tok.alias("n_tok"),
        (F.col(id_col) % n_shards).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = base.select(
        "shard",
        "doc_id",
        "n_tok",
        (F.sum("n_tok").over(w) - F.col("n_tok")).alias("start"),
    )
    return (
        staged.select("shard", "doc_id", "n_tok", F.expr(f"start div {seq_len}").alias("pack"))
        .groupBy("shard", "pack")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )
