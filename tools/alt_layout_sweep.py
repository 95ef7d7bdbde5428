#!/usr/bin/env python
"""Parity sweep under a DELIBERATELY different partition layout.

The driver and the test session both use power-of-two parallelism;
float aggregation order (and thus ±0.0 / rounding-boundary behavior)
depends on the partition layout, so a sweep that only ever runs under
one layout can miss order-sensitive hash flakes (round-4 verdict:
`community_modularity_audit` flipped between runs). This harness runs
the same driver-exact compare under local[11] with 7 shuffle
partitions — different split points, different summation orders.

    python tools/alt_layout_sweep.py 0 250
    python tools/alt_layout_sweep.py 250 500

Prints one JSON line {"range": [lo, hi], "bad": [...], "n": N}.
Round-5 receipt: 499/499 green under this layout (2026-08-15).
"""

from __future__ import annotations

import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    lo, hi = int(sys.argv[1]), int(sys.argv[2])
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[11]")
        .config("spark.sql.shuffle.partitions", "7")
        .config("spark.default.parallelism", "11")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    from bigdataamazon_spark import queries as registry
    from tests.parity import compare

    names = sorted(registry.queries().keys())[lo:hi]
    bad: list[tuple[str, str]] = []
    per_name: dict[str, str] = {}
    for n in names:
        try:
            p = compare(spark, n, sf_dir)
            if p:
                bad.append((n, p[0][:160]))
            per_name[n] = "green" if not p else "red"
        except Exception as e:  # noqa: BLE001
            bad.append((n, f"EXC {type(e).__name__}: {e}"[:160]))
            per_name[n] = "red"
        spark.catalog.clearCache()
    print(json.dumps({"range": [lo, hi], "bad": bad, "n": len(names)}))
    # shard artifact for tools/merge_sweep.py (r07 verdict #6: publish
    # the full sweep as a diffable SWEEP_rN.json next to CORRECTNESS)
    out = os.environ.get("SWEEP_SHARD_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(
                {
                    "layout": "local[11]/7-shuffle",
                    "sf_dir": sf_dir,
                    "range": [lo, hi],
                    "entries": per_name,
                    "bad": bad,
                },
                f,
            )
    spark.stop()


if __name__ == "__main__":
    main()
