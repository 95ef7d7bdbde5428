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


class _RunningCountsProcessor:
    """StatefulProcessor twin of ``_update_counts`` on the Spark 4
    ``transformWithStateInPandas`` API: typed ValueState instead of a
    single opaque GroupState tuple, explicit lifecycle (init/close),
    and room for timers/TTL the old API lacks. Needs the RocksDB state
    store provider (``transform_with_state_session_confs``)."""

    def init(self, handle) -> None:
        self._agg = handle.getValueState("agg", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        if self._agg.exists():
            n, total = self._agg.get()
        else:
            n, total = 0, 0.0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._agg.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    def close(self) -> None:
        pass


def transform_with_state_session_confs() -> dict[str, str]:
    """Session confs transformWithStateInPandas requires: the operator
    is implemented only on the RocksDB state store (the default
    HDFS-backed store lacks the column-family support typed state
    handles compile to)."""
    return {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        )
    }


def tws_runtime_available() -> bool:
    """transformWithStateInPandas talks to the JVM state server over a
    protobuf protocol, so the Python side needs ``google.protobuf`` at
    runtime (PySpark lists it under the optional ``connect`` extra).
    Without it the TWS driver worker crashes at query start; callers
    should fall back to ``stateful_user_counts`` (GroupState), which has
    no such dependency."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def tws_user_counts(stream: DataFrame) -> DataFrame:
    """``stateful_user_counts`` re-expressed on transformWithStateInPandas
    (Spark 4's replacement for applyInPandasWithState): same per-user
    running totals, same update-mode emission, but state lives in named
    typed slots (ValueState) that can carry TTLs, and the processor can
    register event-/processing-time timers for gap-out emission — the
    building blocks for custom session operators beyond what
    ``session_window`` expresses."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # subclass dynamically so importing this module never hard-depends on
    # the Spark 4 API surface (older clusters still get the GroupState op)
    proc = type(
        "_RunningCountsStatefulProcessor",
        (_RunningCountsProcessor, StatefulProcessor),
        {},
    )()
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=COUNTS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
