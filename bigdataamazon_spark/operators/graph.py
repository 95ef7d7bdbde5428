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
long-path graphs (diameter ≫ rounds) the published fix is
large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond", 2014) — implemented here as
``connected_components_star`` and wired in as an automatic fallback:
if min-label propagation has not converged after ``max_iter`` rounds,
``connected_components`` finishes with the star algorithm (O(log²)
rounds regardless of diameter) instead of returning under-merged
labels. Dedup graphs are shallow so the fallback almost never fires;
it exists so a pathological near-dup chain can never silently
under-merge.

Driver-loop discipline: the per-round ``labels`` frame is
``localCheckpoint``-ed — lineage would otherwise double every round
and the convergence-check action would replay the whole history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import materialize_shared


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
    # initialization FUSED with the first propagation round: label_0 =
    # min(self, neighbors) is one agg over und (cheaper than the
    # loop's join+agg+checkpoint round it replaces — each round is
    # ~0.4 s of fixed job overhead on a small graph)
    labels = (
        und.groupBy(F.col("a").alias("node"))
        .agg(F.least(F.first("a"), F.min("b")).alias("label"))
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
        # carry the convergence flag THROUGH the checkpoint: the changed
        # count then scans checkpointed blocks (no recompute, no second
        # join-the-previous-round job per iteration)
        new_labels = (
            labels.join(nbr_min.withColumnRenamed("a", "node"), "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nl"), F.col("label"))).alias(
                    "label"
                ),
                (F.col("nl").isNotNull() & (F.col("nl") < F.col("label"))).alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("_chg")).limit(1).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    else:
        # max_iter rounds without convergence: the graph's diameter
        # exceeds the propagation budget (adversarial chain). Finish
        # exactly with large-star/small-star instead of returning
        # under-merged labels — O(log²) rounds regardless of diameter.
        # The star algorithm canonicalizes away self-loops, but the
        # propagation contract keeps self-loop-only nodes (they are in
        # und and label themselves) — union them back so the node set
        # never depends on which path converged.
        star = connected_components_star(und, src="a", dst="b")
        nodes = und.select(F.col("a").alias("node")).distinct()
        lonely = nodes.join(star, "node", "left_anti").withColumn(
            "label", F.col("node")
        )
        # materialize BEFORE unpersisting: lonely derives from und, so
        # dropping the cache first would force the caller's first
        # action to recompute the symmetrized-distinct edge set from
        # scratch. The (node, label) result is node-bounded, and this
        # path is already eager (it only fires after max_iter rounds).
        result = star.unionByName(lonely).localCheckpoint(eager=True)
        und.unpersist()
        return result
    und.unpersist()
    return labels


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge set oriented larger-endpoint-first (u > v),
    self-loops dropped, duplicates collapsed."""
    return (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round: every node connects its strictly-larger
    neighbors to the min of its closed neighborhood. Output stays in
    the canonical u > v orientation (the emitted min is ≤ the center,
    which is < the emitted neighbor)."""
    und = e.select(F.col("u").alias("c"), F.col("v").alias("n")).union(
        e.select(F.col("v").alias("c"), F.col("u").alias("n"))
    )
    m = und.groupBy("c").agg(F.least(F.min("n"), F.col("c")).alias("m"))
    return (
        und.join(m, "c")
        .filter(F.col("n") > F.col("c"))
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: every node rewires its smaller-or-equal
    neighbors (and itself) to the min of its smaller neighborhood."""
    m = e.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = (
        e.join(m, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    center = m.select(F.col("u"), F.col("m").alias("v"))
    return nbrs.union(center).distinct()


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(node, label) by alternating large-star/small-star (Kiveris et
    al. 2014): converges to a star forest centered at each component's
    min id in O(log²|V|) rounds REGARDLESS of graph diameter — the
    exact-CC algorithm for adversarial long chains where min-label
    propagation needs O(diameter) rounds. Same output contract as
    ``connected_components`` (isolated nodes absent). Each round is
    two groupBy-min + two joins on the shrinking edge set; the edge
    frame is localCheckpoint-ed per round so lineage stays flat.
    Convergence = the round leaves the edge set unchanged AND the set
    is structurally a star forest (no leaf has two centers, no node is
    both leaf and center). Kiveris et al. prove stability implies the
    star shape; the structural check is a cheap belt-and-suspenders so
    the label extraction below can never silently emit a multi-label
    node if an implementation detail ever violates the theorem's
    preconditions."""
    e = _canonical_edges(edges, src, dst).localCheckpoint(eager=True)
    for _ in range(max_iter):
        new_e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        grew = new_e.join(e, ["u", "v"], "left_anti").limit(1).count()
        shrank = e.join(new_e, ["u", "v"], "left_anti").limit(1).count()
        e = new_e
        if grew == 0 and shrank == 0:
            multi_center = (
                e.groupBy("u")
                .agg(F.count_distinct("v").alias("_nc"))
                .filter(F.col("_nc") > 1)
                .limit(1)
                .count()
            )
            leaf_center = (
                e.select("u").join(e.select(F.col("v").alias("u")), "u")
                .limit(1)
                .count()
            )
            if multi_center == 0 and leaf_center == 0:
                break
    else:
        raise RuntimeError(
            f"connected_components_star: no star-forest fixpoint after "
            f"{max_iter} rounds (needs ~log²|V|); raise max_iter"
        )
    # fixpoint = star forest: leaves point at their component min, and
    # each center is its own label
    return (
        e.select(F.col("u").alias("node"), F.col("v").alias("label"))
        .union(e.select(F.col("v").alias("node"), F.col("v").alias("label")))
        .distinct()
    )


def dedup_keepers(components: DataFrame) -> DataFrame:
    """One keeper per cluster: the min-id member (= the label itself)."""
    return components.select(F.col("label").alias("keeper_id")).distinct()


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    *,
    iters: int = 5,
    damping: float = 0.85,
    checkpoint_interval: int = 8,
    teleport: DataFrame | None = None,
) -> DataFrame:
    """(node, rank) after a FIXED number of weighted PageRank rounds.

    r_{t+1}(j) = (1-d)/N + d * Σ_i r_t(i) · w_ij / out_i — the directed,
    weight-normalized form. Fixed iteration count (not convergence-test)
    keeps the result bit-deterministic and SQL-replayable, so the oracle
    can chain the same number of CTE rounds. Dangling nodes (no out-edges)
    leak their damped mass by design here; callers that need the
    stochastic-matrix invariant add a uniform dangling term.

    Each round is one shuffle join (ranks ⋈ out-normalized edges) + one
    agg on dst; out-weights are computed once and persisted. Unlike
    :func:`connected_components` (whose convergence check forces an
    action every round), the rank lineage is a LINEAR chain — each round
    reads the previous exactly once — so the whole fixed-round loop
    stays one lazy plan; ``checkpoint_interval`` cuts lineage only every
    k rounds (one job per cut, not per round) for large ``iters``.
    """
    w = F.col(weight) if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("esrc"), F.col(dst).alias("edst"), w.cast("double").alias("w")
    )
    out = e.groupBy("esrc").agg(F.sum("w").alias("out_w"))
    norm = materialize_shared(
        e.join(out, "esrc")
        .select("esrc", "edst", (F.col("w") / F.col("out_w")).alias("p"))
    )
    nodes = materialize_shared(
        e.select(F.col("esrc").alias("node"))
        .union(e.select(F.col("edst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if teleport is None:
        # uniform teleport: (1-d)/N to every node
        tele = nodes.withColumn("t", F.lit(1.0 / n))
    else:
        # personalized: teleport mass restricted to the seed
        # distribution (node, t); non-seeds restart at 0 — the PPR
        # locality property (Jeh & Widom / Haveliwala)
        tele = nodes.join(teleport, "node", "left").select(
            "node", F.coalesce(F.col("t"), F.lit(0.0)).alias("t")
        )
    tele = materialize_shared(tele)
    ranks = tele.withColumnRenamed("t", "rank")
    for i in range(iters):
        contrib = (
            norm.join(ranks.withColumnRenamed("node", "esrc"), "esrc")
            .groupBy("edst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("mass"))
        )
        ranks = tele.join(
            contrib.withColumnRenamed("edst", "node"), "node", "left"
        ).select(
            "node",
            (
                F.lit(1.0 - damping) * F.col("t")
                + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_interval == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    # norm/nodes must stay persisted until the caller's action consumes
    # the returned lazy plan; the bounded shared-cache FIFO (catalog.
    # materialize_shared) evicts them once enough newer intermediates
    # pile up, so repeated invocations in a long-lived session cannot
    # accumulate cache without limit.
    return ranks


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    *,
    iters: int = 4,
) -> DataFrame:
    """(node, hub, authority) after a FIXED number of weighted HITS
    rounds (Kleinberg 1999), L1-normalized each half-step so every
    round is SQL-replayable (same fixed-round discipline as
    :func:`pagerank`): a_k(j) = norm Σ_{i→j} h_{k-1}(i)·w_ij,
    h_k(i) = norm Σ_{i→j} a_k(j)·w_ij. Nodes without in-edges get
    authority 0; without out-edges, hub 0.

    Per round: two keyed joins + two node aggs + two one-row broadcast
    normalizers — the rank frontier is node-sized, the edge table is
    scanned twice per round from a persisted cache, never rebuilt.
    """
    w = F.col(weight) if weight else F.lit(1.0)
    e = materialize_shared(
        edges.select(
            F.col(src).alias("esrc"),
            F.col(dst).alias("edst"),
            w.cast("double").alias("w"),
        )
    )
    nodes = materialize_shared(
        e.select(F.col("esrc").alias("node"))
        .union(e.select(F.col("edst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    h = nodes.withColumn("v", F.lit(1.0 / n))
    a = None
    for _ in range(iters):
        # the normalizer references the raw-score subtree TWICE (sum +
        # divide); without a lineage cut per half-step the plan tree
        # quadruples every round — checkpoint keeps it constant-size
        # (the frame is node-sized, the same discipline as
        # connected_components' per-round labels)
        a_raw = (
            e.join(h.withColumnRenamed("node", "esrc"), "esrc")
            .groupBy("edst")
            .agg(F.sum(F.col("v") * F.col("w")).alias("raw"))
            .localCheckpoint(eager=True)
        )
        a_tot = a_raw.agg(F.sum("raw").alias("tot"))
        a = nodes.join(
            a_raw.withColumnRenamed("edst", "node"), "node", "left"
        ).crossJoin(F.broadcast(a_tot)).select(
            "node",
            (F.coalesce(F.col("raw"), F.lit(0.0)) / F.col("tot")).alias("v"),
        )
        h_raw = (
            e.join(a.withColumnRenamed("node", "edst"), "edst")
            .groupBy("esrc")
            .agg(F.sum(F.col("v") * F.col("w")).alias("raw"))
            .localCheckpoint(eager=True)
        )
        h_tot = h_raw.agg(F.sum("raw").alias("tot"))
        h = nodes.join(
            h_raw.withColumnRenamed("esrc", "node"), "node", "left"
        ).crossJoin(F.broadcast(h_tot)).select(
            "node",
            (F.coalesce(F.col("raw"), F.lit(0.0)) / F.col("tot")).alias("v"),
        )
    return nodes.join(
        h.withColumnRenamed("v", "hub"), "node", "left"
    ).join(a.withColumnRenamed("v", "authority"), "node", "left").select(
        "node",
        F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub"),
        F.coalesce(F.col("authority"), F.lit(0.0)).alias("authority"),
    )


def triangle_counts(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """Per-node triangle counts over an undirected graph given as ordered
    edges (src < dst, deduplicated). Closes ordered wedges u<v<w with two
    equi-joins, so each triangle is constructed exactly once; the three
    rotations then fold into one hash agg. 100 TB note: the classic
    degree-ordering refinement (orient each edge from its lower-degree
    endpoint) bounds the wedge join on skewed graphs and drops in here
    without changing the join shape."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(e3, (F.col("e1.u") == F.col("e3.u")) & (F.col("e2.v") == F.col("e3.v")))
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    # r10 (guide §2.4): the three rotations used to fold via a 3-branch
    # unionAll, and each branch re-planned (and re-ran) the full wedge
    # join — the triangle construction executed THREE times per action.
    # A map-side explode of the (a, b, c) row emits the identical node
    # multiset from ONE pass over the join output (same-session A/B on
    # the co-supply graph at sf0.1: min 2.27 -> 0.91 s, rows identical).
    nodes = tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


def kcore(edges: DataFrame, k: int, src: str = "u", dst: str = "v") -> DataFrame:
    """k-core of an undirected graph (ordered dedup'd edges): iteratively
    peel nodes of degree < k until fixpoint; return surviving nodes with
    their in-core degree.

    Each peel round is one symmetric-edge degree agg plus two semi-joins
    to drop edges touching peeled nodes — all equi-shuffles on the node
    key, combiner-friendly. Rounds are bounded by the peel depth (real
    co-occurrence graphs: single digits; the loop early-stops the first
    round nothing peels). Per-round frames are localCheckpoint-ed so the
    convergence-check action never replays history — same driver-loop
    discipline as :func:`connected_components`. At 100 TB each round is
    a fixed number of keyed exchanges over a strictly-shrinking edge
    set; the standard refinement (batch-peel all degrees < k by bucket)
    drops the round count further without changing any join shape.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = e.localCheckpoint(eager=True)
    while True:
        deg = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("node")
        n_drop = deg.count() - keep.count()
        if n_drop == 0:
            return deg.filter(F.col("d") >= k)
        e = (
            e.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )


def label_propagation(
    edges: DataFrame,
    iters: int,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Synchronous weighted label propagation (community detection) —
    ``iters`` fixed rounds, fully deterministic.

    Input edges are directed as given; pass a symmetrized edge set for
    an undirected graph. Every node starts labeled with its own id;
    each round node v adopts the label L maximizing
    ``sum(weight)`` over in-neighbors currently labeled L, ties broken
    by min L; nodes with no in-edges keep their label. Fixed iteration
    count (not convergence) keeps the result engine-replayable: the
    oracle unrolls the same rounds as SQL CTEs.

    NUMERIC node ids required (ADVICE r09): the per-round argmax
    tie-breaks via ``max_by`` over a ``(score, -label)`` struct, and
    the negation narrows labels to numeric types — string ids throw
    ``CAST_INVALID_INPUT`` under ANSI. Every current caller passes
    numeric keys; a string-keyed graph must map ids to a numeric
    surrogate first (the window form this replaced ordered any
    orderable type, but paid a per-partition sort per round).

    Scale shape: each round is one keyed exchange (edge join on dst's
    label table) plus one combiner-friendly agg on (v, label) and a
    per-v window argmax — the same per-round cost as
    :func:`connected_components`, with the same localCheckpoint
    discipline so the loop never replays lineage. Integer/exact
    weights keep the argmax deterministic across engines.
    """
    w_col = F.col(weight) if weight else F.lit(1)
    # pin the (possibly expensive) edge build once — every round's eager
    # checkpoint action would otherwise replay the upstream joins
    e = edges.select(
        F.col(src).alias("e_src"), F.col(dst).alias("e_dst"), w_col.alias("e_w")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("e_src").alias("node"))
        .unionAll(e.select(F.col("e_dst").alias("node")))
        .distinct()
    )
    labels = nodes.select("node", F.col("node").alias("lbl"))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(iters):
        scores = (
            e.join(labels, e["e_dst"] == labels["node"])
            .groupBy("e_src", "lbl")
            .agg(F.sum("e_w").alias("s"))
        )
        # argmax by (s desc, lbl asc) as max_by over a (s, -lbl) struct:
        # same deterministic winner as the previous row_number window,
        # but a combiner-friendly hash agg — partial aggregation runs
        # map-side and no per-partition sort is paid (r09; the window
        # form shuffled every (v, label) score row, then sorted each
        # partition, every round)
        best = scores.groupBy("e_src").agg(
            F.max_by(
                F.col("lbl"), F.struct(F.col("s"), (-F.col("lbl")).alias("neg"))
            ).alias("new_lbl")
        ).select(F.col("e_src").alias("node"), "new_lbl")
        labels = (
            labels.join(best, "node", "left")
            .select("node", F.coalesce("new_lbl", "lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
    return labels


def bfs_hops(
    edges: DataFrame,
    source,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 10,
) -> DataFrame:
    """(node, hops): minimum hop count from ``source`` over directed
    edges (symmetrize for undirected). Frontier-relaxation BFS: each
    round joins the current distance table to the edge list and keeps
    improved distances — one keyed exchange + min-agg per round, the
    same localCheckpoint loop discipline as the rest of this module.
    Fixed ``max_hops`` (not convergence) keeps it oracle-replayable;
    unreached nodes are absent."""
    e = edges.select(F.col(src).alias("b_src"), F.col(dst).alias("b_dst"))
    e = e.localCheckpoint(eager=True)
    dist = (
        e.sparkSession.createDataFrame([(source, 0)], ["node", "hops"])
    ).localCheckpoint(eager=True)
    for _ in range(max_hops):
        relaxed = (
            e.join(dist, e["b_src"] == dist["node"])
            .select(F.col("b_dst").alias("node"), (F.col("hops") + 1).alias("hops"))
        )
        dist = (
            dist.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
            .localCheckpoint(eager=True)
        )
    return dist
