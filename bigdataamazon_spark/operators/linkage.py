"""Record linkage / entity resolution (fuzzy matching beyond §2.6 J4).

The reference's joins are exact-key or containment probes
(``/root/reference/amazon1.py:132-137`` builds its recommender on exact
token overlap); a real catalog/crawl pipeline also needs *approximate
string identity* — "cold anvil" vs "old anvil" are the same product
entity with a typo. The scalable shape is the classic two-stage design:

1. **Blocking**: a cheap deterministic key (or several) assigns each
   record to candidate groups; only records sharing a block are ever
   compared. This is the LSH idea applied to strings — the all-pairs
   comparison never exists, the shuffle key is the short block key.
2. **Verification**: exact edit distance on the candidates only,
   using Spark's bounded ``levenshtein(l, r, threshold)`` (O(d·n) with
   early exit instead of O(n²) full DP).

Blocking is recall/cost: a pair that shares no block is never found
(standard in ER literature; the default last-token block catches
edits confined to other tokens). Callers widen recall by passing
several ``block_exprs`` — each record enters one group per key, pairs
dedup afterwards — and bound cost on hot blocks with ``max_block``
(same degenerate-bucket remedy as similarity.lsh_candidate_pairs).

Clustering: verified pairs feed graph.connected_components, and each
cluster elects a canonical representative — deterministic min-id, the
same keeper rule as the dedup ladder.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..catalog import materialize_shared
from . import graph

# Above this width a block is degenerate (a near-universal key): the
# all-pairs expansion inside it is capped to an id-sorted adjacent chain,
# keeping candidate volume linear in block width. Transitive closure
# downstream still connects the chain into one cluster.
LINK_MAX_BLOCK = 1024


def default_block(name: Column) -> Column:
    """Last whitespace token, lowercased — survives leading-word edits
    (typos rarely rewrite every token) and gives near-uniform groups on
    list-like names ('cold anvil' -> 'anvil')."""
    return F.lower(F.element_at(F.split(F.trim(name), r"[ \t\n\r\f\x0B]+"), -1))


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    *,
    max_dist: int = 2,
    block_exprs: list[Column] | None = None,
    max_block: int = LINK_MAX_BLOCK,
) -> DataFrame:
    """(src, dst, src_name, dst_name, dist): id-ordered candidate pairs
    with levenshtein(name, name) <= max_dist, generated per block.

    One shuffle on the block key into a groupBy; the {i<j} pair
    expansion is narrow (same plan family as dedup.exact_jaccard_pairs).
    Records sharing several blocks yield one output row (dropDuplicates
    on the id pair — candidate sets are small after verification).
    """
    blocks = block_exprs or [default_block(F.col(name_col))]
    base = df.select(F.col(id_col).alias("_id"), F.col(name_col).alias("_nm"))
    entered = None
    for i, b in enumerate(blocks):
        src = df.select(
            F.concat_ws("#", F.lit(str(i)), b.cast("string")).alias("_bk"),
            F.col(id_col).alias("_id"),
        )
        entered = src if entered is None else entered.unionByName(src)
    members = F.array_sort(F.collect_set("_id"))
    grouped = entered.groupBy("_bk").agg(members.alias("ids")).filter(F.size("ids") >= 2)
    # degenerate blocks -> adjacent chain (linear), normal blocks -> all pairs
    chain = F.transform(
        F.slice(F.col("ids"), 1, F.size("ids") - 1),
        lambda x, i: F.struct(
            x.alias("src"), F.element_at(F.col("ids"), i + 2).alias("dst")
        ),
    )
    allp = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("src"), y.alias("dst")),
            ),
        )
    )
    pairs = (
        grouped.select(
            F.explode(
                F.when(F.size("ids") > max_block, chain).otherwise(allp)
            ).alias("p")
        )
        .select("p.src", "p.dst")
        .dropDuplicates(["src", "dst"])
    )
    a = base.select(F.col("_id").alias("src"), F.col("_nm").alias("src_name"))
    b = base.select(F.col("_id").alias("dst"), F.col("_nm").alias("dst_name"))
    # bounded edit distance: -1 marks "exceeded threshold", filtered out
    dist = F.levenshtein(F.col("src_name"), F.col("dst_name"), max_dist)
    return (
        pairs.join(a, "src")
        .join(b, "dst")
        .withColumn("dist", dist)
        .filter(F.col("dist") >= 0)
        .select("src", "dst", "src_name", "dst_name", "dist")
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    name_col: str,
    *,
    max_dist: int = 2,
    block_exprs: list[Column] | None = None,
) -> DataFrame:
    """(id, name, entity_id, canonical_name): transitive closure of the
    fuzzy-pair graph, canonical member = min id per cluster (the dedup
    keeper rule — deterministic, no order dependence). Singletons keep
    themselves as canonical."""
    base = materialize_shared(
        df.select(F.col(id_col).alias("_id"), F.col(name_col).alias("_nm"))
    )
    pairs = blocked_fuzzy_pairs(
        base, "_id", "_nm", max_dist=max_dist, block_exprs=block_exprs
    ).select("src", "dst")
    comp = graph.connected_components(pairs)
    canon = comp.select(F.col("label").alias("_cid")).distinct()
    canon_names = canon.join(
        base.select(F.col("_id").alias("_cid"), F.col("_nm").alias("canonical_name")),
        "_cid",
    )
    resolved = (
        base.join(comp.withColumnRenamed("node", "_id"), "_id", "left")
        .select(
            "_id", "_nm", F.coalesce(F.col("label"), F.col("_id")).alias("entity_id")
        )
        .join(
            canon_names.withColumnRenamed("_cid", "entity_id").select(
                "entity_id", "canonical_name"
            ),
            "entity_id",
            "left",
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("_nm").alias(name_col),
            "entity_id",
            F.coalesce(F.col("canonical_name"), F.col("_nm")).alias("canonical_name"),
        )
    )
    return resolved
