"""Stateful streaming operators (SURVEY.md §2.9 extension).

Two rungs above the stateless window aggregates:

- ``stream_dedup_events``: exactly-once-per-key semantics over a replayed
  source via ``dropDuplicatesWithinWatermark`` — the streaming twin of the
  batch exact-dedup rung (operators/dedup.py). State is bounded by the
  watermark: a key older than the watermark can be evicted because any
  duplicate that late would be dropped by the watermark anyway.

- ``stateful_user_counts``: a custom stateful operator through
  ``applyInPandasWithState`` — per-user running event counts/value totals
  kept in explicit GroupState. This is the escape hatch for semantics the
  built-in operators can't express (per-key custom accumulators, ad-hoc
  session logic); each trigger processes a user's new rows as Arrow
  batches, so the Python hop is vectorized, and state shuffles once on
  user_id per trigger.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

COUNTS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def stream_dedup_events(stream: DataFrame, *, watermark: str = "1 hour") -> DataFrame:
    """Drop replayed duplicates of event_id within the watermark window.

    Needs an event-time column named ``ts`` (TIMESTAMP). State size is
    O(distinct keys inside the watermark horizon), not O(stream length).
    """
    return stream.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    ).dropDuplicatesWithinWatermark(["event_id"])


def _update_counts(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
    )


def session_aggregate(events: DataFrame, *, gap: str = "30 minutes") -> DataFrame:
    """The shared batch/stream sessionization: gap-merged session windows
    per user with event count + value total (the streaming twin of the
    oracle-checked ``user_sessions`` registry query)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").cast("string").alias("session_start"),
            F.col("w.end").cast("string").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def stream_user_sessions(
    stream: DataFrame, *, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """session_window under readStream: the state store merges windows
    as events arrive; the watermark closes sessions whose gap has
    definitively passed and bounds state."""
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return session_aggregate(stream.withWatermark("ts", watermark), gap=gap)


def stateful_user_counts(stream: DataFrame) -> DataFrame:
    """Per-user running (count, value-total) in explicit GroupState —
    emits the updated row for every user seen in each trigger."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_counts,
            outputStructType=COUNTS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
