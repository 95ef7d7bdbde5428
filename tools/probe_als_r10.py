#!/usr/bin/env python
"""Round-10 ALS fit decomposition probe (guide §1: measure first).

Runs the als_factorization_audit rating build once, then A/Bs the FIT
under variants back-to-back in one JVM (same-session comparison, the
only timing methodology this host's bursty steal permits — see
OPTIMIZATION_r09.md "Measurement setup"). Nothing here changes the
engine; it informs which knobs (if any) are worth landing.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/probe_als_r10.py
"""

from __future__ import annotations

import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from bigdataamazon_spark.catalog import load_table  # noqa: E402
from bigdataamazon_spark.session import get_spark  # noqa: E402


def build_ratings(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    r = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("l_partkey").cast("int").alias("item"),
        )
        .agg(
            F.log1p(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("rating")
        )
    )
    return r.persist()


def fit_once(r, **kw):
    from pyspark.ml.recommendation import ALS

    t0 = time.perf_counter()
    model = ALS(
        rank=8,
        maxIter=5,
        regParam=0.1,
        seed=42,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        coldStartStrategy="drop",
        **kw,
    ).fit(r)
    dt = time.perf_counter() - t0
    # touch factors so lazy tails don't hide in the next variant
    nu = model.userFactors.count()
    ni = model.itemFactors.count()
    return dt, nu, ni


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bigdataamazon-probe-als")
    r = build_ratings(spark, sf_dir)
    n = r.count()
    par = spark.sparkContext.defaultParallelism
    blocks_now = int(max(4, min(2 * par, n // 150_000 + 1)))
    print(f"n_ratings={n} parallelism={par} current_blocks={blocks_now}")

    variants = [
        ("current(b=%d)" % blocks_now, dict(numUserBlocks=blocks_now, numItemBlocks=blocks_now)),
        ("blocks=2", dict(numUserBlocks=2, numItemBlocks=2)),
        ("blocks=1", dict(numUserBlocks=1, numItemBlocks=1)),
        (
            "b=%d interm=MEMORY_ONLY" % blocks_now,
            dict(
                numUserBlocks=blocks_now,
                numItemBlocks=blocks_now,
                intermediateStorageLevel="MEMORY_ONLY",
                finalStorageLevel="MEMORY_ONLY",
            ),
        ),
        (
            "b=2 interm=MEMORY_ONLY",
            dict(
                numUserBlocks=2,
                numItemBlocks=2,
                intermediateStorageLevel="MEMORY_ONLY",
                finalStorageLevel="MEMORY_ONLY",
            ),
        ),
    ]
    # two passes so each variant gets a warm JVM reading; report min
    results: dict[str, float] = {}
    for _pass in range(2):
        for name, kw in variants:
            spark.sparkContext.setJobDescription(f"als-fit:{name}")
            dt, nu, ni = fit_once(r, **kw)
            results[name] = min(results.get(name, float("inf")), dt)
            print(f"pass{_pass} {name:28s} fit={dt:6.3f}s uf={nu} if={ni}", flush=True)
    print("MIN:", {k: round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
