"""Parquet source/sink — the engine's canonical tabular format.

Absent from the reference (its only sink is HTML,
``/root/reference/amazon1.py:36-39``); mandatory for the rebuilt engine:
Parquet is what the testdata ships as, and at 100 TB it is the only
listed format with column pruning + predicate pushdown + splittable
files. The sink defaults are the cluster-safe ones: snappy, no
driver-side coalesce, partition columns for pruning on known filters.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Scan parquet path/glob. Filters and projections composed on the
    result reach the scan (PushedFilters / ReadSchema) — callers should
    filter early and trust pushdown rather than pre-materialize."""
    return spark.read.parquet(path)


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "error",
    max_records_per_file: int | None = None,
) -> None:
    """Write df as parquet.

    - ``partition_by``: hive-style partition dirs -> partition pruning
      for every downstream query filtering on those columns. Choose
      low-cardinality keys (date, category); high-cardinality keys
      create a small-file explosion.
    - ``max_records_per_file``: bounds file size without a repartition
      (Spark splits within each task); use instead of coalesce(1)-style
      driver funnels, which serialize the write through one task.
    """
    w = df.write.mode(mode)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> int:
    """Rewrite a small-file parquet directory into ~target-sized files;
    returns the number of output partitions requested.

    Streaming sinks, per-task writes, and hive partitioning all shed
    thousands of tiny files over time; at scale each file costs a
    listing call, a footer read, and a scheduler task, so scan latency
    degrades long before data size does. Compaction = one distributed
    read → round-robin ``repartition(ceil(bytes/target))`` → write.
    The explicit partition count pins the output width (AQE won't
    re-split it), and ``sort_within_by`` optionally re-sorts rows
    inside each output file so parquet row-group min/max stats prune
    range predicates on those columns (cheap zone-map clustering, no
    global sort).

    Local-filesystem sizing only (os.walk); on an object store, size
    from the catalog/listing instead. Not atomic: write to a fresh
    directory and swap a pointer (see streaming/sinks.py) rather than
    overwriting in place.
    """
    n = max(1, math.ceil(_dir_bytes(in_path) / target_file_bytes))
    df = spark.read.parquet(in_path).repartition(n)
    if sort_within_by:
        df = df.sortWithinPartitions(*sort_within_by)
    df.write.mode("error").parquet(out_path)
    return n


def zorder_value(df: DataFrame, cols: list[str], *, bits: int = 16):
    """Z-order (Morton) key over numeric columns as ONE codegen'd long
    expression: each column min-max-scales to ``bits`` buckets, then the
    bucket bits interleave (bit b of column i lands at position
    b·ncols+i). Rows close in z are close in EVERY input dimension, so
    range-partitioning by z clusters each output file in all the
    dimensions at once — which single-column sorting cannot do.
    Returns (zcol, stats_row); nulls scale to bucket 0. Column count ×
    bits must stay ≤ 63 to fit the long."""
    from pyspark.sql import functions as F

    assert len(cols) * bits <= 63, "z-value must fit a signed long"
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")), F.max(F.col(c).cast("double"))]
    stats = df.agg(*aggs).first()
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        lo, hi = stats[2 * i], stats[2 * i + 1]
        rng = (hi - lo) if hi is not None and hi > lo else 1.0
        scaled = F.coalesce(
            F.least(
                F.lit(top).cast("long"),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.floor(
                        (F.col(c).cast("double") - F.lit(lo)) / F.lit(rng) * top
                    ).cast("long"),
                ),
            ),
            F.lit(0).cast("long"),
        )
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(scaled, b).bitwiseAND(F.lit(1)), b * len(cols) + i)
            )
    return z


def zorder_compact(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    zorder_by: list[str],
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    bits: int = 16,
) -> int:
    """Compaction with multi-dimensional clustering: range-partition by
    the interleaved z-value and sort within files by it, so parquet
    row-group min/max stats prune predicates on ANY of ``zorder_by`` —
    the lakehouse OPTIMIZE ZORDER shape, built from public primitives.
    Costs one extra exchange (range partitioner sampling included)
    versus plain compaction; pays for itself on the first scan that
    filters a z-ordered column. Same non-atomicity caveat as
    ``compact_parquet``."""
    n = max(1, math.ceil(_dir_bytes(in_path) / target_file_bytes))
    df = spark.read.parquet(in_path)
    z = zorder_value(df, zorder_by, bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("error")
        .parquet(out_path)
    )
    return n
