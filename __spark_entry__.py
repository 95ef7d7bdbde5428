"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``bigdataamazon_spark/``; this module is the
thin adapter.

Rows-only-by-contract entries (no ``oracle_sql`` key — the driver
records spark_rows only). Each is approximate or iterative by nature
and its correctness is hash-pinned by a driver-green audit twin:

- ``cosine_topk_lsh``   -> twin ``ann_recall_audit`` (r04): exact-vs-LSH
  recall receipt over the same corpus/parameters.
- ``cosine_topk_ivf``   -> twin ``ann_recall_audit`` (r04), plus
  ``ivf_index_topk``/``pq_codebook_audit`` for the index path.
- ``ml_als_top_recs``   -> twin ``als_factorization_audit`` (r04):
  reconstruction-error contract on the same factorization.
- ``ml_minhash_neardup_pairs`` -> twin ``minhash_accuracy_audit`` (r06):
  signature-vs-exact-Jaccard tolerance receipt.

(``approx_order_stats`` was drained in r07: it now emits exact group
stats plus sketch-tolerance contract flags and carries a full oracle.)
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
