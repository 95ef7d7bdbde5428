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
