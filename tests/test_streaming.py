"""Structured Streaming smoke: the file-source stream over the same
events rows must agree with its batch twin (unified-model guarantee)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from bigdataamazon_spark.catalog import load_table
from bigdataamazon_spark.streaming.windows import stream_windowed_counts, windowed_counts


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir):
    """Re-write sf0.001 events as a micros-timestamped parquet dir the
    streaming file source can watch (the raw testdata file is nanos,
    which the streaming reader rejects like the batch one)."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_matches_batch(spark, sf_dir, events_dir):
    batch = windowed_counts(spark.read.parquet(events_dir))
    expected = {tuple(r) for r in batch.collect()}

    stream_df = stream_windowed_counts(spark, events_dir)
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_counts")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {tuple(r) for r in spark.sql("SELECT * FROM stream_counts").collect()}
    finally:
        q.stop()
    assert got == expected
    assert len(got) > 0
