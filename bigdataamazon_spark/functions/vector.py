"""Vector math over ``array<float|double>`` columns — all Catalyst-native.

The reference computes cosine similarity as one sparse GEMM on the driver
(``/root/reference/amazon1.py:138``). At scale the n×n matrix is the one
thing that cannot exist, so the engine only ever computes *per-pair*
scores inside joins; these helpers build the scalar expressions.

``F.zip_with`` + ``F.aggregate`` keep the arithmetic JVM-side (no UDF);
everything is upcast to double first so accumulation order is the only
source of float jitter (and it is fixed: left-to-right over the array).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-sum dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """cos(a,b); callers that join many pairs should precompute norms
    per side instead (see operators.similarity)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def max_abs(a: Column) -> Column:
    """max(|x_i|) — the symmetric-quantization scale."""
    return F.array_max(F.transform(a, lambda x: F.abs(x)))


def quantize_int8(a: Column, scale: Column) -> Column:
    """Symmetric int8 quantization: q_i = round(127 · x_i / scale) as
    ``array<tinyint>`` — 4× smaller than float32 at rest and on the
    shuffle wire, which is the difference between an embedding column
    that fits the shuffle and one that doesn't at 100 TB. Rounding is
    ties-away-from-zero on both engines (Spark HALF_UP, DuckDB round),
    so quantized values are bit-identical cross-engine."""
    return F.transform(a, lambda x: F.round(x * F.lit(127.0) / scale).cast("tinyint"))


def dequantize_int8(q: Column, scale: Column) -> Column:
    """Inverse map back to double: x̂_i = q_i · scale / 127."""
    return F.transform(q, lambda x: x.cast("double") * scale / F.lit(127.0))


def centroid_agg(vec_col: Column | str, dim: int, *, round_to: int = 4) -> Column:
    """Element-wise mean of a fixed-dim vector column as ONE aggregate
    expression: ``array(avg(v[0]), …, avg(v[dim-1]))``. Mean-pooling per
    group (class prototypes, IVF seed centroids, per-source embedding
    drift) without exploding — the explode plan multiplies shuffle rows
    by ``dim``; this stays one row per input, partial-aggregates
    map-side, and remains inside whole-stage codegen."""
    v = as_double_array(vec_col)
    return F.array(
        *[F.round(F.avg(F.element_at(v, i + 1)), round_to) for i in range(dim)]
    )
