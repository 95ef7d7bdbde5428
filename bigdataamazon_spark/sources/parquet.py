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
