"""ORC source/sink — the second columnar format (S1 widened).

Same scale contract as parquet (columnar, splittable, predicate/column
pushdown via ``spark.sql.orc.filterPushdown``, on by default); offered
because warehouse estates that grew up on Hive hand over ORC, and an
engine claiming "switch to this repo and run every query" must scan
what they already have without a rewrite-to-parquet migration step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Scan ORC path/glob. Filters and projections composed on the
    result push into the scan exactly as with parquet."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "error",
    max_records_per_file: int | None = None,
) -> None:
    """Write df as ORC (snappy default). Same sink rules as the parquet
    sink: hive-style partition dirs for pruning, maxRecordsPerFile
    instead of coalesce(1) driver funnels."""
    w = df.write.mode(mode)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
