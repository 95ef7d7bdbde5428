#!/usr/bin/env python
"""Checkpoint-recovery receipts: exactly-once across a mid-stream restart.

tools/stream_bench.py proves the streaming plans are correct and fast as
long-running multi-batch pipelines; what it cannot show is what happens
when the driver DIES — the property a 1000-executor ingest actually
leans on. Structured Streaming's contract is end-to-end exactly-once
for a replayable source + transactional sink + checkpoint: the offset
log pins each micro-batch's input, the state store version-travels with
the batch id, and the file sink's ``_spark_metadata`` commit log makes
output atomic. This tool drives that contract on a ~1M-event corpus:

    python tools/stream_recovery.py [--reps 10] [--files 20] [--out JSON]

Checks (each: wall, a stop-point record, and an equality verdict):

  windowed_agg_restart  stream_windowed_counts (append mode) into a
                parquet FILE sink. The query is stopped as soon as ~1/3
                of the micro-batches have committed — mid-stream, with
                a batch typically in flight — then restarted from the
                same checkpoint + sink and drained. Recovery must
                replay the interrupted batch WITHOUT double-writing it:
                sink.exceptAll(batch_twin) == 0 catches both wrong rows
                and duplicated rows (multiset semantics), and >= 98% of
                the twin's windows must be present (the tail below the
                final watermark never closes — same bound as
                stream_bench).

  dedup_state_restart   stream_dedup_events with a DETERMINISTIC
                cross-restart replay plant: phase 1 (first half of the
                files) runs to completion and stops; the phase-2 files
                are only then moved into the source dir, and their
                head file carries exact event_id replays (ts +5 min) of
                originals drawn from the final 24 h of phase-1 event
                time — above the checkpointed 48 h watermark, so they
                are droppable ONLY if the dedup key state survived the
                restart. Emitted count == distinct event_id count: if
                the state store were lost, every planted replay
                re-emits and the count overshoots by exactly the plant
                size; if the sink commit log were broken, the replayed
                in-flight batch double-writes. Both collapse into one
                equality.

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

BASE = "/tmp/stream_recovery"


def _make_corpus(reps: int, files: int, replant: int) -> dict:
    """Time-ordered sliced corpus (stream_bench's shape) split into a
    phase-1 source half and a staged phase-2 half whose head file
    plants ``replant`` exact-id replays of phase-1-tail originals."""
    import duckdb

    src = f"{BASE}/src"
    staged = f"{BASE}/staged"
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(src), os.makedirs(staged)
    con = duckdb.connect()
    con.execute(f"""
        CREATE TABLE corpus AS
        WITH reps AS (SELECT unnest(range({reps})) AS k)
        SELECT event_id + k * 10000000 AS event_id,
               ts + INTERVAL (k * 30) DAY AS ts,
               user_id, event_type, value, props
        FROM '/root/testdata/sf0.1/events.parquet', reps
    """)
    con.execute(f"""
        CREATE TABLE sliced AS
        SELECT *, ntile({files}) OVER (ORDER BY ts) AS bucket FROM corpus
    """)
    half = files // 2
    (p1_max,) = con.execute(
        f"SELECT max(ts) FROM sliced WHERE bucket <= {half}"
    ).fetchone()
    # Replays of originals from the last 24 h of phase-1 event time:
    # the dedup check runs with a 48 h watermark (the production dedup
    # horizon is days, not minutes), so every replay's ts (+5 min) sits
    # well ABOVE the checkpointed watermark (p1_max - 48h) and
    # dropDuplicatesWithinWatermark must consult restored key state —
    # not the late-data filter — to drop it.
    con.execute(f"""
        CREATE TABLE replays AS
        SELECT event_id, ts + INTERVAL 5 MINUTE AS ts,
               user_id, event_type, value, props
        FROM sliced
        WHERE bucket <= {half}
          AND ts >= TIMESTAMP '{p1_max}' - INTERVAL 24 HOUR
        ORDER BY ts LIMIT {replant}
    """)
    (n_replays,) = con.execute("SELECT count(*) FROM replays").fetchone()
    n_events, n_unique = con.execute(
        "SELECT count(*), count(DISTINCT event_id) FROM corpus"
    ).fetchone()
    for k in range(1, files + 1):
        dest = src if k <= half else staged
        con.execute(f"""
            COPY (SELECT event_id, ts, user_id, event_type, value, props
                  FROM sliced WHERE bucket = {k})
            TO '{dest}/part-{k:04d}.parquet' (FORMAT PARQUET)
        """)
    # The replay file is staged separately and fed ONLY to the dedup
    # check's source: in the windowed-agg check these rows would be
    # legitimate late data (below the 10-minute agg watermark at their
    # processing time), which streaming correctly drops and the batch
    # twin correctly counts — an asymmetry that is watermark semantics,
    # not a recovery defect.
    con.execute(f"""
        COPY (SELECT * FROM replays ORDER BY ts)
        TO '{BASE}/replays.parquet' (FORMAT PARQUET)
    """)
    return {
        "src": src,
        "staged": staged,
        "replay_file": f"{BASE}/replays.parquet",
        "n_events": int(n_events),
        "n_unique": int(n_unique),
        "n_replays": int(n_replays),
        "files": files,
        "half": half,
    }


def _commits(ckpt: str) -> int:
    try:
        return len(
            [f for f in os.listdir(f"{ckpt}/commits") if not f.startswith(".")]
        )
    except FileNotFoundError:
        return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--files", type=int, default=20)
    ap.add_argument("--replant", type=int, default=2000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bigdataamazon_spark.streaming.stateful import stream_dedup_events
    from bigdataamazon_spark.streaming.windows import (
        EVENT_SCHEMA,
        stream_windowed_counts,
        windowed_counts,
    )

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .appName("stream-recovery")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = _make_corpus(args.reps, args.files, args.replant)
    src = corpus["src"]
    checks: dict[str, dict] = {}

    def record(name, ok, wall, note=""):
        checks[name] = {"pass": bool(ok), "wall_sec": round(wall, 1), "note": note}

    # ---- check 1: mid-flight stop + restart, windowed agg, file sink
    # Phase-2 files are present from the start here; the restart point
    # is whenever ~files/3 commits have landed (a batch is usually in
    # flight when stop() fires — the interesting crash shape).
    for f in sorted(os.listdir(corpus["staged"])):
        shutil.copy(f"{corpus['staged']}/{f}", f"{src}/{f}")
    ckpt, sink = f"{BASE}/ckpt_wagg", f"{BASE}/sink_wagg"

    def start_wagg():
        return (
            stream_windowed_counts(spark, src, max_files_per_trigger=1)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    def drain_and_finalize(q, ckpt):
        """processAllAvailable + wait for the watermark-finalizing
        no-data micro-batch. processAllAvailable only guarantees the
        DATA batches; the final batch's watermark advance is emitted by
        a no-data batch that races with stop() — observed as the last
        file's windows missing from the sink when stop() wins."""
        q.processAllAvailable()
        seen = _commits(ckpt)
        deadline = time.time() + 15
        while time.time() < deadline and _commits(ckpt) <= seen:
            time.sleep(0.2)
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(60)

    t0 = time.perf_counter()
    target = max(2, args.files // 3)
    q = start_wagg()
    while _commits(ckpt) < target and q.isActive:
        time.sleep(0.2)
    stop_at = _commits(ckpt)
    q.stop()
    q.awaitTermination(60)
    q2 = start_wagg()
    drain_and_finalize(q2, ckpt)
    wall = time.perf_counter() - t0

    batch = spark.read.schema(EVENT_SCHEMA).parquet(src)
    twin = windowed_counts(batch.withColumn("ts", F.col("ts").cast("timestamp")))
    got = spark.read.parquet(sink)  # _spark_metadata log: committed files only
    n_got, n_twin = got.count(), twin.count()
    n_bad = got.exceptAll(twin).count()
    ok = n_bad == 0 and n_got >= 0.98 * n_twin
    record(
        "windowed_agg_restart", ok, wall,
        note=(
            f"stopped after {stop_at}/{args.files} commits; "
            f"{n_got}/{n_twin} windows in sink, {n_bad} dup/wrong rows"
        ),
    )

    # ---- check 2: dedup key-state restore across a clean restart
    ckpt, sink = f"{BASE}/ckpt_dedup", f"{BASE}/sink_dedup"
    src2 = f"{BASE}/src_dedup"
    os.makedirs(src2)
    for f in sorted(os.listdir(src))[: corpus["half"]]:
        if f.startswith("part-"):
            shutil.copy(f"{src}/{f}", f"{src2}/{f}")

    def start_dedup():
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(src2)
        )
        return (
            stream_dedup_events(stream, watermark="48 hours")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    t0 = time.perf_counter()
    q = start_dedup()
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
    phase1_commits = _commits(ckpt)
    # only now does phase 2 appear: the replay file FIRST (copy order =
    # mtime order = file-source processing order), then the tail files
    shutil.copy(corpus["replay_file"], f"{src2}/part-replays.parquet")
    for f in sorted(os.listdir(corpus["staged"])):
        shutil.copy(f"{corpus['staged']}/{f}", f"{src2}/{f}")
    q2 = start_dedup()
    q2.processAllAvailable()
    q2.stop()
    wall = time.perf_counter() - t0

    n_out = spark.read.parquet(sink).count()
    ok = n_out == corpus["n_unique"]
    record(
        "dedup_state_restart", ok, wall,
        note=(
            f"{n_out} emitted vs {corpus['n_unique']} unique ids; "
            f"{corpus['n_replays']} cross-restart replays planted "
            f"(overshoot would be +{corpus['n_replays']}); "
            f"phase-1 commits {phase1_commits}"
        ),
    )

    n_fail = sum(1 for c in checks.values() if not c["pass"])
    result = {
        "bench": "streaming-checkpoint-recovery",
        "corpus": {k: corpus[k] for k in ("n_events", "n_unique", "n_replays", "files")},
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
