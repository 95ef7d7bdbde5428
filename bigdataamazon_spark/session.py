"""SparkSession factory tuned for this engine.

Defaults target the driver harness (single JVM, ``local[$SPARK_GRAFT_CPUS]``)
but every knob is chosen to also be the right call on a real cluster:

- AQE on (runtime coalesce, broadcast conversion, skew-join splitting) —
  at 100 TB the static plan is always wrong somewhere; AQE repairs it.
- shuffle partitions sized to cores locally; on a cluster AQE's
  ``coalescePartitions`` makes the initial number much less critical.
- Arrow on for any pandas_udf / toPandas hop.
- session timezone pinned UTC so timestamp semantics match the DuckDB
  oracle (and are deployment-independent).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "bigdataamazon-spark"


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = DEFAULT_APP_NAME, *, ui: bool = False) -> SparkSession:
    """Build (or reuse) the engine's SparkSession."""
    cpus = cpu_count()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local mode = driver IS the executor: 32 task threads share this
        # heap, and persisted blocks live in it too. 8g showed GC-driven
        # timing outliers under memory-heavy text queries; 16g is still
        # an eighth of the box.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "true" if ui else "false")
        # testdata parquet files are single small files; keep splits sane
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
