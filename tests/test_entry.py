from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_smoke(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert set(df.columns) == {"src", "dst", "score", "rank"}


def test_registry_consistency():
    mod = _load_entry()
    q = mod.queries()
    o = mod.oracle_sql()
    assert q, "no queries registered"
    assert set(o).issubset(set(q)), "oracle for unknown query"


def test_observation_metrics_ride_the_action(spark):
    """df.observe(): pipeline metrics (row count, sum, null count)
    collected as a side-channel of the SAME action — no second scan.
    The operational surface for production counters on curation jobs."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    obs = Observation("orders_metrics")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum("o_totalprice").alias("total"),
        F.sum(F.col("o_custkey").isNull().cast("int")).alias("null_keys"),
    )
    n_rows = observed.count()
    got = obs.get
    assert got["n"] == n_rows
    assert got["null_keys"] == 0
    assert got["total"] > 0


def test_bench_emit_lines_contract():
    """The driver keeps only a ~2000-char stdout tail and parses the
    LAST line: the compact line must stay bounded (and hold the same
    headline value as the detailed line) even when MANY queries fail
    with long messages — the r04 parsed=null truncation class."""
    import json

    import bench

    timings = {f"q{i}": 0.5 for i in range(104)}
    errors = {f"bad{i:02d}": "SomeError: " + "x" * 150 for i in range(30)}
    lines = bench.emit_lines(timings, errors, 0.1)
    assert len(lines) == 2
    detailed, compact = (json.loads(ln) for ln in lines)
    assert detailed["value"] == compact["value"] == round(104 * 0.5, 4)
    assert detailed["n_errors"] == compact["n_errors"] == 30
    assert len(detailed["queries"]) == 104
    assert "queries" not in compact and "errors" not in compact
    assert len(compact["failed"]) == 10  # names only, hard-bounded
    assert len(lines[1]) < 2000, len(lines[1])
    # clean run: no error keys at all
    d2, c2 = (json.loads(ln) for ln in bench.emit_lines(timings, {}, 0.1))
    assert "n_errors" not in d2 and "n_errors" not in c2 and "failed" not in c2
