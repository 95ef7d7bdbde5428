"""Streaming sinks: foreachBatch upsert into a parquet snapshot.

The standard streaming-CDC pattern: each micro-batch is a change set,
MERGEd into the serving snapshot by key — exactly-once *effect* on top
of Spark's at-least-once foreachBatch, because the merge is idempotent
per key (replaying a batch re-applies the same rows to the same keys).

Plain parquet has no transactional commit, so the snapshot swap here is
write-to-versioned-dir + pointer file; on a cluster you'd hand the same
``merge_upsert`` plan to a table format (Delta/Iceberg/Hudi) whose
commit protocol makes the swap atomic across writers. The merge plan —
snapshot never shuffles, change keys broadcast — is the same shape as
the batch op ``operators/relational.merge_upsert``, plus per-key
``order_col`` arbitration so reordered/replayed batches cannot regress
the snapshot.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

_POINTER = "_CURRENT"


def _current_version(snapshot_dir: str) -> str | None:
    p = os.path.join(snapshot_dir, _POINTER)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return f.read().strip() or None


def read_snapshot(spark, snapshot_dir: str) -> DataFrame | None:
    v = _current_version(snapshot_dir)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(snapshot_dir, v))


def upsert_batch(
    batch: DataFrame,
    snapshot_dir: str,
    key_cols: list[str],
    order_col: str,
    epoch_id: int,
) -> None:
    """Merge one micro-batch into the snapshot.

    Correctness under replay AND reordering: the winner for a key is
    the row with max ``order_col`` across {current snapshot row, batch
    rows} — NOT blind last-batch-wins, or an out-of-order micro-batch
    would regress the snapshot. The arbitration set is tiny (touched
    snapshot rows ∪ batch), so its window is cheap; the untouched bulk
    of the snapshot only ever feels a broadcast anti probe — the
    snapshot is never shuffled no matter its size.
    """
    spark = batch.sparkSession
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(order_col), *[F.desc(c) for c in batch.columns if c != order_col]
    )
    latest = (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    current = read_snapshot(spark, snapshot_dir)
    if current is None:
        merged = latest
    else:
        keys = latest.select(*key_cols).distinct()
        touched = current.join(F.broadcast(keys), key_cols, "left_semi")
        winners = (
            touched.unionByName(latest)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        untouched = current.join(F.broadcast(keys), key_cols, "left_anti")
        merged = untouched.unionByName(winners)
    version = f"v{epoch_id}"
    merged.write.mode("overwrite").parquet(os.path.join(snapshot_dir, version))
    tmp = os.path.join(snapshot_dir, _POINTER + ".tmp")
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, os.path.join(snapshot_dir, _POINTER))


def stream_upsert_sink(
    stream: DataFrame,
    snapshot_dir: str,
    key_cols: list[str],
    order_col: str,
    *,
    checkpoint_dir: str,
    query_name: str = "upsert_sink",
):
    """Attach the merge sink to a stream; returns the StreamingQuery."""
    os.makedirs(snapshot_dir, exist_ok=True)
    return (
        stream.writeStream.outputMode("update")
        .foreachBatch(
            lambda df, epoch: upsert_batch(
                df, snapshot_dir, key_cols, order_col, epoch
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
