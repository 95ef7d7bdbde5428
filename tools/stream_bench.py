#!/usr/bin/env python
"""Structured Streaming throughput + equality receipts.

Streaming correctness is pinned by pytest (batch-twin equality on every
path at sf sizes); what pytest can't show is whether the streaming
plans hold up as a long-running multi-batch pipeline — watermark
advancing batch over batch, state bounded by eviction, and a
throughput number against the batch twin on identical input. This tool
drives exactly that, the way a production file-drop ingest would:

    python tools/stream_bench.py [--reps 30] [--files 30] [--out JSON]

Corpus: the sf0.1 events table replicated ``reps``× with a +30-day
event-time shift per replica (event_id offset keeps ids unique), plus
5% planted replays (same event_id, ts +5 minutes) for the dedup check,
written as ``files`` time-ordered parquet files — one micro-batch each
under maxFilesPerTrigger=1, so the watermark advances monotonically
and append-mode windows actually close.

Receipts (each: wall, events/sec, and an equality check):

  windowed_agg   stream_windowed_counts, APPEND mode (the bounded-state
                 production shape — complete mode would re-emit every
                 window every batch): every emitted row must equal its
                 batch-twin row exactly, and >= 98% of the batch twin's
                 windows must have been emitted (the unemitted tail is
                 the final watermark horizon, which never closes).
  stateful_dedup stream_dedup_events over the replay-planted corpus:
                 emitted count == the batch exact-distinct count on
                 event_id (every replay dropped, nothing else).
  interval_join  stream_click_purchase_pairs (stream-stream inner join,
                 time-range condition bounding both state sides): the
                 emitted pair set must EQUAL the batch-twin join on the
                 same input — inner-join matches emit as they arrive,
                 so after processAllAvailable the sets are comparable
                 exactly.

Emits one JSON line ({"checks": {...}, "n_fail": N}; --out file), exit
1 on any failure — same contract as tools/run_stress.py --gate.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

BENCH_DIR = "/tmp/stream_bench"


def _make_corpus(reps: int, files: int) -> tuple[str, int, int]:
    """Time-shifted replicas + planted replays, written as ``files``
    time-ordered parquet files. Returns (src_dir, n_events, n_unique)."""
    import duckdb

    src = f"{BENCH_DIR}/src"
    shutil.rmtree(BENCH_DIR, ignore_errors=True)
    os.makedirs(src, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
        CREATE TABLE corpus AS
        WITH reps AS (SELECT unnest(range({reps})) AS k),
        expanded AS (
          SELECT event_id + k * 10000000 AS event_id,
                 ts + INTERVAL (k * 30) DAY AS ts,
                 user_id, event_type, value, props
          FROM '/root/testdata/sf0.1/events.parquet', reps
        )
        SELECT * FROM expanded
        UNION ALL
        SELECT event_id, ts + INTERVAL 5 MINUTE AS ts,
               user_id, event_type, value, props
        FROM expanded WHERE event_id % 20 = 0
    """)
    n_events, n_unique = con.execute(
        "SELECT count(*), count(DISTINCT event_id) FROM corpus"
    ).fetchone()
    con.execute(f"""
        CREATE TABLE sliced AS
        SELECT *, ntile({files}) OVER (ORDER BY ts) AS bucket FROM corpus
    """)
    # one COPY per slice, in time order, so path order == mtime order ==
    # event-time order and the file source's watermark advances per batch
    for k in range(1, files + 1):
        con.execute(f"""
            COPY (SELECT event_id, ts, user_id, event_type, value, props
                  FROM sliced WHERE bucket = {k} ORDER BY ts)
            TO '{src}/part-{k:04d}.parquet' (FORMAT PARQUET)
        """)
    return src, int(n_events), int(n_unique)


def _drain(query, t0: float) -> float:
    query.processAllAvailable()
    wall = time.perf_counter() - t0
    query.stop()
    return wall


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--files", type=int, default=30)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bigdataamazon_spark.streaming.joins import (
        click_purchase_pairs,
        stream_click_purchase_pairs,
    )
    from bigdataamazon_spark.streaming.stateful import stream_dedup_events
    from bigdataamazon_spark.streaming.windows import (
        EVENT_SCHEMA,
        stream_windowed_counts,
        windowed_counts,
    )

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .appName("stream-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    src, n_events, n_unique = _make_corpus(args.reps, args.files)
    batch_events = spark.read.schema(EVENT_SCHEMA).parquet(src)

    checks: dict[str, dict] = {}

    def record(name, ok, wall, note=""):
        checks[name] = {
            "pass": bool(ok),
            "wall_sec": round(wall, 1),
            "events_per_sec": round(n_events / wall),
            "note": note,
        }

    # 1. windowed agg, append mode (bounded state; windows emit on close)
    ckpt = f"{BENCH_DIR}/ckpt_wagg"
    t0 = time.perf_counter()
    q = (
        stream_windowed_counts(spark, src, max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName("wagg")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    wall = _drain(q, t0)
    emitted = spark.table("wagg")
    twin = windowed_counts(
        batch_events.withColumn("ts", F.col("ts").cast("timestamp"))
    )
    n_emitted = emitted.count()
    n_twin = twin.count()
    n_mismatch = (
        emitted.exceptAll(twin).count()  # every emitted row must exist in the twin
    )
    ok = n_mismatch == 0 and n_emitted >= 0.98 * n_twin
    record(
        "windowed_agg", ok, wall,
        note=f"{n_emitted}/{n_twin} windows closed+emitted, {n_mismatch} mismatched",
    )

    # 2. stateful dedup over the replay-planted corpus
    ckpt = f"{BENCH_DIR}/ckpt_dedup"
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    t0 = time.perf_counter()
    q = (
        stream_dedup_events(stream)
        .writeStream.format("memory")
        .queryName("dedup")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    wall = _drain(q, t0)
    n_out = spark.table("dedup").count()
    ok = n_out == n_unique
    record(
        "stateful_dedup", ok, wall,
        note=f"{n_out} emitted vs {n_unique} unique ids ({n_events - n_unique} planted replays)",
    )

    # 3. stream-stream interval join vs the batch twin (exact set equality)
    ckpt = f"{BENCH_DIR}/ckpt_join"
    t0 = time.perf_counter()
    q = (
        stream_click_purchase_pairs(spark, src, max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName("cpjoin")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    wall = _drain(q, t0)
    got = spark.table("cpjoin")
    ev_ts = batch_events.withColumn("ts", F.col("ts").cast("timestamp"))
    twin = click_purchase_pairs(
        ev_ts.filter(F.col("event_type") == "click"),
        ev_ts.filter(F.col("event_type") == "purchase"),
    )
    n_got = got.count()
    n_twin = twin.count()
    n_sym = got.exceptAll(twin).count() + twin.exceptAll(got).count()
    ok = n_sym == 0 and n_got == n_twin
    record(
        "interval_join", ok, wall,
        note=f"{n_got} pairs vs twin {n_twin}, sym-diff {n_sym}",
    )

    n_fail = sum(1 for c in checks.values() if not c["pass"])
    result = {
        "bench": "structured-streaming",
        "corpus": {"src": src, "n_events": n_events, "files": args.files},
        "checks": checks,
        "n_fail": n_fail,
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
