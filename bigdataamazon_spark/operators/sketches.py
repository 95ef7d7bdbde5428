"""Distributed heavy-hitter detection via per-partition Misra-Gries.

The reference computes exact value counts in pandas (value_counts over
the whole frame, ``/root/reference/amazon1.py:62-68`` is the closest
shape); at 100 TB an exact top-frequency pass shuffles every distinct
key. The classic two-pass sketch alternative:

1. **Candidate pass** — every partition streams its values through a
   Misra-Gries summary of ``k`` counters (decrement-all when full;
   O(k) memory regardless of partition size or key cardinality). Any
   item with global frequency > n/k must exceed n_p/k in at least one
   partition (pigeonhole over partition sizes), and a Misra-Gries
   summary always retains items above its partition's n_p/k — so the
   union of per-partition candidates is a SUPERSET of the true global
   heavy hitters, independent of row order.
2. **Exact pass** — re-count ONLY the candidates (broadcast hash
   semi-join, then an aggregate whose post-map-side-combine shuffle is
   bounded by k x partitions rows instead of |V| x partitions) and keep
   those strictly above n/k.

Because step 2 recounts exactly and the candidate set can only
over-include, the final output is deterministically the exact heavy
hitters — the sketch bounds the work, never the answer (same
audit-friendly shape as hll_distinct_audit / minhash_accuracy_audit).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _misra_gries_partition(
    batches: Iterator[pd.DataFrame], colname: str, k: int
) -> Iterator[pd.DataFrame]:
    """Stream one partition's values through k Misra-Gries counters.

    Counter state persists across Arrow batches (mapInPandas hands the
    whole partition to one generator). Decrements are batched: instead
    of the textbook one-at-a-time decrement loop, a full counter table
    subtracts the minimum count in one vectorized pass — an equivalent
    (weight-preserving) schedule of the same algorithm.
    """
    counters: dict[object, int] = {}
    for pdf in batches:
        for item, cnt in pdf[colname].value_counts().items():
            cnt = int(cnt)
            if item in counters:
                counters[item] += cnt
            elif len(counters) < k:
                counters[item] = cnt
            else:
                m = min(counters.values())
                dec = min(m, cnt)
                counters = {
                    i: c - dec for i, c in counters.items() if c - dec > 0
                }
                if cnt - dec > 0:
                    counters[item] = cnt - dec
    yield pd.DataFrame({"item": list(counters.keys())})


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """Exact items with frequency strictly above count(df)/k, found
    with bounded memory/shuffle (module docstring). Returns
    ``(item, freq)`` with item typed as the input column."""
    item_type = dict(zip(df.columns, [f.dataType for f in df.schema.fields]))[col]
    vals = df.select(F.col(col).alias("item")).where(F.col("item").isNotNull())
    candidates = (
        vals.mapInPandas(
            lambda it: _misra_gries_partition(it, "item", k),
            schema=T.StructType([T.StructField("item", item_type)]),
        )
        .distinct()
    )
    total = vals.groupBy().agg(F.count(F.lit(1)).alias("_n"))
    exact = (
        vals.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("freq") > F.col("_n") / k)
        .select("item", "freq")
    )
