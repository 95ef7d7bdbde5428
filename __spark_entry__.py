"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``bigdataamazon_spark/``; this module is the
thin adapter.

Every registered entry carries an oracle as of r07 — the historical
rows-only five were drained: ``approx_order_stats`` (exact group stats
+ sketch-tolerance flags), ``cosine_topk_lsh`` (full SQL replay — the
seeded hyperplanes are literals in the oracle, the ``ann_recall_audit``
mechanism), and ``cosine_topk_ivf`` / ``ml_minhash_neardup_pairs`` /
``ml_als_top_recs`` (self-auditing form: exact replayable columns next
to tolerance contract flags, because KMeans fits, Spark-internal hash
seeds, and iterative ALS are not SQL-expressible; a regression flips a
flag and hash-reds the row). Audit twins ``ann_recall_audit``,
``quantile_sketch_audit``, ``als_factorization_audit`` and
``minhash_accuracy_audit`` additionally hash-pin the approximate paths.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from bigdataamazon_spark import queries as _registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (cosine top-k neighbor table) on sf0.001."""
    return _registry.queries()["cosine_topk"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
