"""Stream-stream interval join (SURVEY.md §2.9 extension).

The funnel primitive a clickstream pipeline needs: match each click to
the purchases the same user makes within the attribution horizon. One
transformation serves both engines (unified model):

- batch: a plain self-join with the time-range predicate riding the
  user_id equi-join — oracle-checked in the registry
  (``click_purchase_attribution``);
- streaming: the same join under ``readStream`` with BOTH sides
  watermarked. The time bound plus watermarks is what makes unbounded
  state legal: a click older than (watermark - horizon) can never match
  a future purchase, so the state store evicts it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .windows import EVENT_SCHEMA


def click_purchase_pairs(
    clicks: DataFrame, purchases: DataFrame, *, horizon: str = "1 hour"
) -> DataFrame:
    """(click_id, purchase_id, user_id, click_ts, purchase_ts,
    purchase_value) for purchases within ``horizon`` after the click.

    The interval predicate composes onto the user_id equi-join, so the
    physical plan shuffles both sides by user once — never a cartesian
    range probe."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return (
        c.join(
            p,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")
            ),
        )
        .select(
            "click_id",
            "purchase_id",
            "user_id",
            F.col("click_ts").cast("string").alias("click_ts"),
            F.col("purchase_ts").cast("string").alias("purchase_ts"),
            F.round("purchase_value", 4).alias("purchase_value"),
        )
    )


def click_purchase_pairs_outer(
    clicks: DataFrame, purchases: DataFrame, *, horizon: str = "1 hour"
) -> DataFrame:
    """LEFT OUTER variant of :func:`click_purchase_pairs`: every click
    appears; unconverted clicks carry null purchase columns. In
    streaming this is the shape whose null rows can only be emitted
    once the watermark proves no matching purchase can still arrive
    (click_ts + horizon < watermark) — the state-store eviction
    deadline both sides' watermarks define."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")
        ),
        "leftOuter",
    ).select("click_id", "user_id", "click_ts", "purchase_id")


def stream_click_purchase_pairs_outer(
    spark: SparkSession,
    source_dir: str,
    *,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming left-outer interval join: same watermarked legs as the
    inner variant; matched rows emit as matches arrive, null-extended
    rows only after the click's join window fully expires."""

    def leg(event_type: str) -> DataFrame:
        s = (
            spark.readStream.schema(EVENT_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(source_dir)
            .filter(F.col("event_type") == event_type)
        )
        return s.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
            "ts", watermark
        )

    return click_purchase_pairs_outer(
        leg("click"), leg("purchase"), horizon=horizon
    )


def stream_click_purchase_pairs(
    spark: SparkSession,
    source_dir: str,
    *,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming variant: two readStream legs over the same source,
    each filtered and watermarked, interval-joined. State on the click
    side is bounded by (watermark + horizon); on the purchase side by
    the watermark alone — Spark derives both bounds from the join
    condition, which is why the explicit time range is mandatory for
    stream-stream inner joins at scale."""

    def leg(event_type: str) -> DataFrame:
        reader = spark.readStream.schema(EVENT_SCHEMA).format("parquet")
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        s = reader.load(source_dir).filter(F.col("event_type") == event_type)
        # watermarks need TIMESTAMP (tz); session tz is UTC so the cast
        # is value-stable (same note as streaming/windows.py)
        return s.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
            "ts", watermark
        )

    return click_purchase_pairs(leg("click"), leg("purchase"), horizon=horizon)
