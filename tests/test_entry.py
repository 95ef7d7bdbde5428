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
