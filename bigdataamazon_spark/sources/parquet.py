"""Parquet source/sink — the engine's canonical tabular format.

Absent from the reference (its only sink is HTML,
``/root/reference/amazon1.py:36-39``); mandatory for the rebuilt engine:
Parquet is what the testdata ships as, and at 100 TB it is the only
listed format with column pruning + predicate pushdown + splittable
files. The sink defaults are the cluster-safe ones: snappy, no
driver-side coalesce, partition columns for pruning on known filters.
"""

from __future__ import annotations

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
