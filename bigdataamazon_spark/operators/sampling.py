"""Deterministic corpus sampling + benchmark decontamination.

Training-data curation ops beyond the reference's surface (BASELINE.json
"text analysis" ladder; the reference samples implicitly by slicing the
pandas frame, ``/root/reference/amazon1.py:24-29``).

Sampling here is hash-based, not ``rand()``-based: a sample defined by
``md5(seed ':' key)`` is reproducible across runs, engines, partition
layouts and cluster sizes — the property a 100 TB curation pipeline
actually needs (``rand()`` resamples on every retry or re-shuffle, so a
failed stage silently changes the corpus). Every sampler is a narrow
projection + filter: zero shuffle, fully inside the scan's
WholeStageCodegen span, and the filter is a deterministic pure
expression so Catalyst pushes surviving-column pruning into the scan.

The hash layout matches the dedup ladder's 60-bit md5-prefix ids
(``operators/dedup.py``): Spark ``conv(substr(md5(s),1,15),16,10)`` ==
DuckDB ``('0x' || substr(md5(s),1,15))::BIGINT``, so every oracle can
replay the exact sample.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^60: the first 15 hex chars of an md5 as a uniform integer's range.
HASH_SPACE = float(1 << 60)


def hash_fraction(key: Column, seed: str = "s42") -> Column:
    """Deterministic uniform [0, 1) draw from a row key.

    First 60 bits of ``md5(seed ':' key)`` divided by 2^60. Both engines
    convert the bigint to an IEEE double with round-to-nearest before
    the divide, so threshold comparisons agree bit-for-bit.
    """
    s = F.concat(F.lit(seed + ":"), key.cast("string"))
    num = F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")
    return num / F.lit(HASH_SPACE)


def hash_sample(
    df: DataFrame, rate: float, key_col: str, *, seed: str = "s42"
) -> DataFrame:
    """Uniform deterministic sample: keep rows with draw < rate."""
    return df.filter(hash_fraction(F.col(key_col), seed) < F.lit(rate))


def mixture_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    strata_col: str,
    key_col: str,
    *,
    seed: str = "s42",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — corpus mixture reweighting.

    ``rates`` maps stratum value -> keep-rate (e.g. upweight en, floor
    zh). The rate lookup is a literal ``create_map`` expression, NOT a
    join: the whole op stays a single narrow filter regardless of corpus
    size. Strata missing from ``rates`` fall back to ``default_rate``.
    """
    pairs = [lit for k, v in rates.items() for lit in (F.lit(k), F.lit(float(v)))]
    rate = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(strata_col)),
        F.lit(float(default_rate)),
    )
    return df.filter(hash_fraction(F.col(key_col), seed) < rate)


def shard_assignments(
    df: DataFrame,
    key_col: str,
    *,
    n_shards: int = 8,
    seed: str = "s42",
) -> DataFrame:
    """Deterministic global shuffle: (key, shard, pos) — the exact
    training-example order a dataloader will read, decided by data
    alone.

    ``rand()``-based shuffles change on every retry; ``orderBy(rand())``
    is additionally a full global sort. Here shard = hash mod n_shards
    and pos = rank of the hash within the shard, so (a) the order is
    reproducible across engines, cluster sizes, and stage retries,
    (b) there is no global sort — one hash-partitioned exchange plus a
    per-shard sort, parallelism = n_shards, and (c) adding a shard
    never perturbs the relative order of rows that stayed put in some
    other shard. Pick n_shards ≫ executor count at scale; the sort is
    per-shard, so shard size (not corpus size) bounds task memory.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + ":"), F.col(key_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    from pyspark.sql import Window

    hashed = df.select(F.col(key_col), h.alias("_h")).withColumn(
        "shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("_h", key_col)
    return hashed.select(
        key_col,
        "shard",
        F.row_number().over(w).cast("int").alias("pos"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop training docs sharing ANY word n-gram with a benchmark set.

    The standard eval-decontamination pass (13-grams in published
    pipelines; parameterized because the synthetic docs are short).

    Scale shape: the benchmark's distinct n-grams are tiny relative to
    the corpus (evals are ~1e3-1e6 grams) — broadcast them, so the
    contaminated-id scan is a map-side semi join over the exploded
    corpus grams with no corpus-wide shuffle. The distinct on hit
    doc-ids shuffles only the hits, and the final left_anti against the
    doc table broadcasts that (AQE) — the full corpus is never
    shuffled.
    """
    from .dedup import doc_shingles

    bench_grams = (
        doc_shingles(benchmark, id_col=id_col, text_col=text_col, n=n)
        .select("shingle")
        .distinct()
    )
    corpus_grams = doc_shingles(
        docs, id_col=id_col, text_col=text_col, n=n, distinct=False
    )
    contaminated = (
        corpus_grams.join(F.broadcast(bench_grams), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return docs.join(
        contaminated.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    key_col: str,
    weight_col: str,
    *,
    seed: str = "w42",
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement, size ``n``
    (Efraimidis & Spirakis, "Weighted random sampling with a
    reservoir", IPL 2006 — public): each row draws u = hash(key) in
    (0,1) and scores u^(1/w); the top-n scores ARE a weighted sample
    without replacement. Entirely expression-level — the 'reservoir'
    becomes a TakeOrdered top-n, no state, no sequential pass, and the
    same keys win on any cluster size or retry (unlike rand()-based
    sampling). u is clamped away from 0 so zero/negative draws cannot
    produce NaN scores, and rows with non-positive weight are DROPPED
    before scoring (w <= 0 would otherwise invert the score — 1/0 -> inf
    and negative w would make the lowest-weight rows win).
    """
    u = F.greatest(hash_fraction(F.col(key_col), seed), F.lit(1e-18))
    score = F.pow(u, F.lit(1.0) / F.col(weight_col))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_ws", score)
        .orderBy(F.desc("_ws"), F.asc(key_col))
        .limit(n)
        .drop("_ws")
    )
