"""Named query registry — the driver-facing contract.

Every entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with
(where SQL-expressible) a DuckDB oracle string over the same parquet
tables. Column names/types are aligned on both sides because the driver
hashes values after sorting columns by name (``__spark_entry__.py``).

Conventions for oracle parity (SURVEY.md §5, §7 "hard parts"):
- alias every computed column identically on both sides;
- round double aggregates (granularity chosen ≫ float-jitter);
- deterministic tie-breaks in every top-k (key asc);
- cast DuckDB's widened types (HUGEINT sums, BIGINT row_number) back
  to the Spark result type.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .catalog import load_table
from .operators import similarity

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


# ---------------------------------------------------------------------------
# Similarity search (SURVEY.md §2.7 M5/M6 generalized to embeddings)
# ---------------------------------------------------------------------------

_COSINE_TOPK_ORACLE = """
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec
  FROM embeddings
), normed AS (
  SELECT vec_id, vec, sqrt(list_dot_product(vec, vec)) AS nrm FROM base
), edges AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) AS score
  FROM normed a JOIN normed b ON a.vec_id <> b.vec_id
), ranked AS (
  SELECT src, dst, score,
         row_number() OVER (PARTITION BY src ORDER BY score DESC, dst ASC) AS rnk
  FROM edges
)
SELECT src, dst, round(score, 6) AS score, CAST(rnk AS INTEGER) AS rank
FROM ranked WHERE rnk <= 5
"""


@register("cosine_topk", _COSINE_TOPK_ORACLE)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: per-vector top-5 cosine neighbors as an edge table
    (replaces the driver-side n×n matrix of ``amazon1.py:138-155``)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, "vec_id", "embedding", k=5)
