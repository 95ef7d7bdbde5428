"""Structured Streaming twins of the batch window aggregates.

Spark's unified model means the transformation is ONE function used by
both the batch query (``queries.event_window_counts``, oracle-checked)
and the stream (smoke-tested with a file source + memory sink). At
scale this runs over Kafka with the same code: watermark bounds state,
window+key grouping shuffles once per trigger.

Watermark semantics as probed on this build (pinned in
tests/test_streaming.py::test_watermark_guarantee_no_reemission_after_eviction):
the watermark is a STATE-CLEANUP bound, not an input filter — a late
row arriving while its window's state is still live is still
aggregated; the guarantee is single emission per window in append mode
(late rows after eviction are dropped, never re-emitted). Consumers
billing on append output rely on exactly that one-shot property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_counts(events: DataFrame, *, window: str = "10 minutes") -> DataFrame:
    """The shared batch/stream transformation: tumbling-window counts +
    value totals per event_type."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    source_dir: str,
    *,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source streaming variant with a watermark bounding state.

    ``update``/``append`` mode choice is the sink's; the smoke test uses
    complete mode into a memory sink and cross-checks against the batch
    twin on identical input. ``max_files_per_trigger`` caps each
    micro-batch at that many source files (None = all available) — the
    knob tools/stream_bench.py uses to drive a time-ordered multi-batch
    run where the watermark actually advances batch over batch."""
    reader = spark.readStream.schema(EVENT_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(source_dir)
    # Watermarks require TIMESTAMP (with timezone); testdata parquet stores
    # TIMESTAMP_NTZ. The session timezone is UTC, so the cast is value-stable.
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return windowed_counts(stream.withWatermark("ts", watermark), window=window)
