"""Iterative connected components — near-dup pairs → dedup clusters.

Pair generation (``operators/dedup.py``) finds edges; an actual dedup
pass must then pick ONE keeper per transitive cluster, which is
connected components over the pair graph. The reference stops at
pairwise similarity (``/root/reference/amazon1.py:138-155``); this is
the missing closure step.

Algorithm: min-label propagation — every node starts labeled with its
own id; each round a node takes the min of its label and its
neighbors' labels; converged when no label changes. Rounds needed =
graph diameter, and near-dup clusters are shallow (near-cliques plus
short chains), so this terminates in a handful of rounds. Each round
is one shuffle join + one agg, both combiner-friendly. For adversarial
long-path graphs the published fix is large-star/small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond"),
which this module's loop structure would host unchanged; dedup graphs
don't need it.

Driver-loop discipline: the per-round ``labels`` frame is
``localCheckpoint``-ed — lineage would otherwise double every round
and the convergence-check action would replay the whole history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, label): label = min node id of the node's component.

    ``edges`` is treated as undirected; nodes appearing only as ``dst``
    are included. Isolated nodes (no edges) are by definition absent —
    callers union them back with label = own id if needed.
    """
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    und = und.persist()
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            und.join(
                labels.select(F.col("node").alias("b"), F.col("label").alias("bl")),
                "b",
            )
            .groupBy("a")
            .agg(F.min("bl").alias("nl"))
        )
        new_labels = (
            labels.join(nbr_min.withColumnRenamed("a", "node"), "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nl"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    und.unpersist()
    return labels


def dedup_keepers(components: DataFrame) -> DataFrame:
    """One keeper per cluster: the min-id member (= the label itself)."""
    return components.select(F.col("label").alias("keeper_id")).distinct()
