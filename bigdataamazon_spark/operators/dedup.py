"""Deduplication operators (SURVEY.md §2.3 generalized per BASELINE.json).

The reference's dedup is exact whole-row ``drop_duplicates()``
(``/root/reference/amazon1.py:119-122``). A training-data pipeline needs
the near-dup ladder on top; each rung here is a composition of joins +
hash-aggs that scales by construction:

- exact:        hash-groupBy on a content key (one shuffle on md5).
- n-gram Jaccard: shingle-set self-join — the join key is the shingle,
  so candidate generation shuffles O(total shingles), not O(n²).
- MinHash+LSH:  signatures -> banded buckets -> equi-join on (band, key)
  -> exact verification ONLY on candidates. The all-pairs step never
  exists; this is the 100 TB path.
- SimHash:      sign-aggregated bit signature + hamming filter.

Hashing portability: signatures must be *engine-independent* so the
DuckDB oracle can replay them bit-for-bit. Shingles are mapped to 60-bit
integer ids by content hash — the first 15 hex chars of md5, which both
engines compute identically (Spark ``conv(substr(md5(s),1,15),16,10)``,
DuckDB ``('0x' || substr(md5(s),1,15))::BIGINT``) — then permuted with
fixed linear-congruential functions h_i(x) = (a_i·(x mod p) + b_i) mod p.
No vocabulary table, no global sort, no join: id assignment is a narrow
projection in the same stage as the scan, which is what lets the ladder
run at 100 TB (the earlier dense-id design needed a row_number over the
whole distinct vocabulary — a single-partition sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..catalog import materialize_shared
from ..functions.text import tokens, word_ngrams

# Fixed MinHash permutation parameters, shared verbatim with the DuckDB
# oracle (see queries.py). 16 hashes in 4 bands of 4.
MINHASH_PRIME = 2147483647
MINHASH_PARAMS: list[tuple[int, int, int]] = [
    (i, a, 97 * i + 13)
    for i, a in enumerate(
        [7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67]
    )
]
MINHASH_BANDS = 4
SIMHASH_A = 1103515245
SIMHASH_B = 12345
SIMHASH_BITS = 31  # h mod 2^31-1 gives 31 usable bits
# second independent LCG for the wide (62-bit) signature mode; the
# Numerical Recipes constants, reduced mod the same Mersenne prime
SIMHASH_A2 = 1664525
SIMHASH_B2 = 1013904223


def content_key_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Exact dedup by content hash: one row per distinct content with the
    smallest id as keeper + multiplicity (D2 at scale: the shuffle key is
    the 128-bit md5, never the full payload)."""
    return (
        df.select(F.md5(F.col(content_col)).alias("content_key"), F.col(id_col))
        .groupBy("content_key")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def doc_shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    *,
    distinct: bool = True,
) -> DataFrame:
    """Word n-gram shingles per document: (doc_id, shingle).

    ``distinct=False`` skips the set-dedup shuffle — pass that when the
    next stage hashes to integer ids and dedups there (8-byte shuffle
    keys instead of shingle strings).

    The input is widened first: a doc table that scans as one task would
    otherwise run the whole tokenize→n-gram→md5 chain single-threaded
    (catalog.widen is a no-op on an already-wide scan)."""
    from ..catalog import widen

    df = widen(df)
    out = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(tokens(F.col(text_col)), n)).alias("shingle"),
    )
    return out.distinct() if distinct else out


def shingle_ids(shingles: DataFrame, *, distinct: bool = True) -> DataFrame:
    """(doc_id, sid): engine-independent 60-bit content-hash shingle ids,
    set semantics (distinct per doc) by default.

    Id assignment is a narrow projection — no vocabulary, no sort, no
    join (see module docstring); the set-dedup shuffles (doc_id, int64)
    only. Collisions at 2^-60 per pair are beyond negligible and, being
    deterministic, affect both engines identically.

    ``distinct=False`` skips the set-dedup shuffle entirely — correct
    ONLY for duplicate-tolerant consumers (MinHash's min-agg; NOT
    SimHash, whose ±1 bit sums count multiplicity).
    """
    sid = F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast("bigint")
    out = shingles.select("doc_id", sid.alias("sid"))
    return out.distinct() if distinct else out


def exact_jaccard_pairs(
    doc_sids: DataFrame,
    threshold: float,
    *,
    candidates: DataFrame | None = None,
    round_to: int = 6,
) -> DataFrame:
    """(src, dst, jaccard) for pairs with set-Jaccard >= threshold.

    Without ``candidates`` the self-join on sid generates all co-shingled
    pairs (exact, O(sum of shingle-frequency²)); with ``candidates`` the
    verification is per-pair set intersection instead (see
    ``verify_jaccard_candidates``) — the LSH verification step.

    Both branches tolerate duplicate (doc_id, sid) rows, so callers can
    skip the corpus-wide set-dedup shuffle: set semantics are restored
    inside the aggregations that shuffle anyway (countDistinct for
    sizes, collect_set in the by-sid group), where the map-side partial
    agg dedups before anything crosses the wire.
    """
    if candidates is not None:
        return verify_jaccard_candidates(
            doc_sids, candidates, threshold, round_to=round_to
        )
    # two consumers below (sizes + the co-shingle pair generation):
    # materialize or the shingle/hash DAG upstream runs twice
    doc_sids = materialize_shared(doc_sids)
    sizes = doc_sids.groupBy("doc_id").agg(F.countDistinct("sid").alias("sz"))
    # Pair generation as ONE groupBy-on-sid + per-shingle combination
    # explode, instead of a sid self-join: the join shuffles the table
    # twice (both sides) and sorts for SMJ; this shuffles it once into a
    # hash agg, then expands {i<j} pairs narrowly. Same O(Σ df²) output,
    # half the shuffle bytes. Hot shingles still blow up quadratically —
    # that is inherent to exact co-shingle counting; the LSH path is the
    # scale answer, this is the exact small/medium-corpus answer.
    docs_arr = F.array_sort(F.collect_set("doc_id"))
    # The {i<j} expansion multiplies rows quadratically per shingle, but
    # its INPUT (one row per shingle) is tiny, so AQE coalesces the
    # post-agg stage down to one partition and the expansion runs
    # single-threaded. An explicit numPartitions repartition pins the
    # exchange width (AQE respects user-specified counts) so the
    # quadratic work and the map-side partial agg of the (src,dst)
    # count below stay parallel.
    width = doc_sids.sparkSession.sparkContext.defaultParallelism
    # {i<j} expansion stays the higher-order transform/flatten form: a
    # chained double-explode (codegen) was tried in r09 and measured
    # SLOWER in full-bench context (+0.2 s) — the first explode
    # re-serializes the whole membership array into every intermediate
    # row, which for high-df shingles costs more than the interpreted
    # HOF walk that slices in place.
    pairs = (
        doc_sids.groupBy("sid")
        .agg(docs_arr.alias("ds"))
        .filter(F.size("ds") >= 2)
        .repartition(width)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ds"),
                        lambda x, i: F.transform(
                            F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                            lambda y: F.struct(x.alias("src"), y.alias("dst")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
    )
    shared = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("shared"))
    jac = F.col("shared") / (F.col("a_sz") + F.col("b_sz") - F.col("shared"))
    # sizes is one row per doc (ids + a count) — broadcast both probes.
    return (
        shared.join(
            F.broadcast(sizes.select(F.col("doc_id").alias("src"), F.col("sz").alias("a_sz"))),
            "src",
        )
        .join(
            F.broadcast(sizes.select(F.col("doc_id").alias("dst"), F.col("sz").alias("b_sz"))),
            "dst",
        )
        .filter(jac >= threshold)
        .select("src", "dst", F.round(jac, round_to).alias("jaccard"))
    )


def prefix_filter_candidates(
    doc_sids: DataFrame,
    threshold: float,
) -> DataFrame:
    """AllPairs-style prefix-filtered candidate pairs for exact Jaccard
    (Bayardo et al., "Scaling Up All Pairs Similarity Search", WWW'07;
    positional refinement in Xiao et al., PPJoin, WWW'08 — both public).

    For J(A,B) >= t the overlap is >= ceil(t·max(|A|,|B|)), so under ANY
    fixed global shingle order the first ``|A| - ceil(t·|A|) + 1``
    shingles of A and the corresponding prefix of B must intersect —
    pairs can therefore be generated from PREFIX postings only. Ordering
    shingles by ascending document frequency puts the corpus's hot
    shingles (the quadratic killers of the naive co-shingle join) in the
    SUFFIXES, where they never generate a candidate. A size filter
    (min >= t·max) prunes further; exact verification restores precision,
    so the final pair set is IDENTICAL to the naive join's.

    Plan: one sid-keyed agg (df), one sid join riding the same
    partitioning, one doc-keyed set-agg, prefix explode, self-join on
    prefix sid (both sides the same canonicalized plan -> the exchange
    is reused), then a distinct over the (small) candidate set.
    Tolerates duplicate (doc_id, sid) rows: collect_set restores set
    semantics; a multiplicity-inflated df only perturbs the ORDER
    heuristic, never correctness.

    WHEN TO USE (measured 2026-08-13): on the synthetic testdata the
    shingle-frequency distribution is near-uniform, so the prefix prunes
    little and the extra shuffles make this ~1.6x SLOWER than
    ``exact_jaccard_pairs``'s direct co-shingle join (3.6s vs 2.2s at
    sf0.1; 51s vs 23s on the 100x stress corpus) — the registry default
    therefore stays the direct join, with MinHash+LSH as the scale path.
    Prefix filtering wins on REAL corpora whose df distribution is
    Zipfian (web text), where a few hot shingles dominate the direct
    join's O(Σ df²) blowup but sit harmlessly in the suffixes here.
    """
    dfc = doc_sids.groupBy("sid").agg(F.count(F.lit(1)).alias("df"))
    ranked = doc_sids.join(dfc, "sid")
    arr = F.array_sort(
        F.collect_set(F.struct(F.col("df"), F.col("sid")))
    )
    prefixed = (
        ranked.groupBy("doc_id")
        .agg(arr.alias("arr"))
        .select(
            "doc_id",
            F.size("arr").alias("sz"),
            F.slice(
                F.col("arr"),
                1,
                (
                    F.size("arr")
                    - F.ceil(F.lit(threshold) * F.size("arr")).cast("int")
                    + F.lit(1)
                ),
            ).alias("prefix"),
        )
    )
    posts = prefixed.select(
        "doc_id", "sz", F.explode(F.col("prefix.sid")).alias("sid")
    )
    return (
        posts.alias("x")
        .join(
            posts.alias("y"),
            (F.col("x.sid") == F.col("y.sid"))
            & (F.col("x.doc_id") < F.col("y.doc_id"))
            & (
                F.least(F.col("x.sz"), F.col("y.sz"))
                >= F.lit(threshold) * F.greatest(F.col("x.sz"), F.col("y.sz"))
            ),
        )
        .select(F.col("x.doc_id").alias("src"), F.col("y.doc_id").alias("dst"))
        .distinct()
    )


def verify_jaccard_candidates(
    doc_sids: DataFrame,
    candidates: DataFrame,
    threshold: float,
    *,
    round_to: int = 6,
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs by per-pair set
    intersection.

    The shingle sets of candidate docs (LSH survivors — a tiny fraction
    of the corpus) are gathered into one array row per doc, candidate
    pairs join to their two arrays, and ``array_intersect`` counts the
    overlap hash-set style, O(|A|+|B|) per pair. Compared with the
    co-shingle self-join this trades three wide shuffles (sid self-join,
    (src,dst) count agg, full-corpus sizes agg) for ONE groupBy over
    the restricted shingles; set size rides along in that same agg
    (a doc's set size is a property of the doc, so computing it on the
    restricted rows is exact). The doc_id joins are left to AQE — the
    sets side is small enough to broadcast at any scale where LSH did
    its job.
    """
    # one scan of the pair list, no distinct: the semi-join's broadcast
    # hash table dedups; a duplicate doc_id costs one extra 8-byte slot,
    # a distinct costs a whole shuffle stage
    cand_docs = candidates.select(
        F.explode(F.array("src", "dst")).alias("doc_id")
    )
    # the two broadcast probes below each materialize their build side —
    # materialize so the semi-join + groupBy runs once, not per-probe
    # collect_set (not list+count): tolerates a non-distinct doc_sids, so
    # the caller can skip the corpus-wide set-dedup shuffle and set
    # semantics are restored here, on the LSH-restricted rows only
    sets = (
        doc_sids.join(F.broadcast(cand_docs), "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_set("sid").alias("sids"))
        .select("doc_id", "sids", F.size("sids").alias("sz"))
    )
    sets = materialize_shared(sets)
    a = sets.select(
        F.col("doc_id").alias("src"), F.col("sids").alias("a_sids"), F.col("sz").alias("a_sz")
    )
    b = sets.select(
        F.col("doc_id").alias("dst"), F.col("sids").alias("b_sids"), F.col("sz").alias("b_sz")
    )
    shared = F.size(F.array_intersect(F.col("a_sids"), F.col("b_sids")))
    jac = F.col("shared") / (F.col("a_sz") + F.col("b_sz") - F.col("shared"))
    # sets holds only LSH survivors — broadcast both probes so the pair
    # scoring never shuffles (AQE would reach the same shape, but only
    # after materializing an exchange on each input first)
    return (
        candidates.join(F.broadcast(a), "src")
        .join(F.broadcast(b), "dst")
        .select("src", "dst", "a_sz", "b_sz", shared.alias("shared"))
        .filter(jac >= threshold)
        .select("src", "dst", F.round(jac, round_to).alias("jaccard"))
    )


def minhash_signatures(doc_sids: DataFrame) -> DataFrame:
    """Long-form MinHash signature: (doc_id, i, minv) for the 16 fixed
    permutations. The K-way blowup is an explode of a literal params
    array — a narrow op in the same stage as the scan, no join in the
    plan at all; partial aggregation (map-side min) then keeps the
    shuffle at |docs|·K rows."""
    params = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.lit(a).cast("bigint").alias("a"),
                F.lit(b).cast("bigint").alias("b"),
            )
            for i, a, b in MINHASH_PARAMS
        ]
    )
    # reduce sid mod p BEFORE multiplying: sids are 60-bit, a*sid would
    # overflow int64 (and DuckDB would silently widen to HUGEINT,
    # breaking bit-parity)
    sid_mod = F.col("sid") % F.lit(MINHASH_PRIME)
    return (
        doc_sids.select("doc_id", sid_mod.alias("_sm"), F.explode(params).alias("p"))
        .groupBy("doc_id", F.col("p.i").alias("i"))
        .agg(
            F.min(
                (F.col("p.a") * F.col("_sm") + F.col("p.b")) % F.lit(MINHASH_PRIME)
            ).alias("minv")
        )
    )


def minhash_signatures_wide(doc_sids: DataFrame) -> DataFrame:
    """Wide-form signatures: one row per doc with 16 ``m{i}`` columns,
    computed as 16 min-aggregates in a SINGLE groupBy — no 16× explode,
    one shuffle over (doc_id, 16 longs). Semantically identical to the
    long form (``minhash_signatures`` keeps that shape for the
    registry/oracle); this is the internal fast path."""
    sid_mod = (F.col("sid") % F.lit(MINHASH_PRIME)).alias("_sm")
    aggs = [
        F.min((F.lit(a) * F.col("_sm") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"m{i}")
        for i, a, b in MINHASH_PARAMS
    ]
    return doc_sids.select("doc_id", sid_mod).groupBy("doc_id").agg(*aggs)


def lsh_candidates_wide(
    wide_sigs: DataFrame,
    bands: int = MINHASH_BANDS,
    *,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Banded LSH over wide signatures: band keys are string-concats of
    the wide columns — derived in the same stage as the aggregate, no
    second groupBy, no collect_list sort.

    Pair generation is a groupBy-per-bucket + in-array {i<j} explode
    rather than a (band, key) self-join: the keyed table shuffles ONCE
    into a hash agg, and singleton buckets — at web scale, nearly all
    of them, since near-dups are rare — die in the size>=2 filter
    without ever reaching pair-matching. The self-join form drags every
    singleton row through an SMJ probe (and sorts both sides) first.

    ``max_bucket_size`` (None = no cap, the registry/oracle contract)
    bounds the mega-bucket pathology the similarity module solved with
    ``LSH_MAX_BUCKET_SIZE`` (r06): a bucket of b near-identical docs —
    a template cluster at corpus scale — otherwise costs a b-element
    ``collect_set`` buffered in ONE agg task plus C(b,2) exploded
    candidates. With a cap, over-cap buckets route through a window
    chain (id-sorted adjacent pairs, b−1 candidates, no array ever
    materialized) — connectivity inside the bucket is preserved, so
    downstream CC closure (``neardup_clusters``) labels the cluster
    identically, while pair ENUMERATION inside over-cap buckets is
    deliberately truncated (the output-bound regime no plan avoids;
    same degradation contract as ``similarity.lsh_scored_pairs``).
    Under-cap buckets are byte-identical to the uncapped plan, and
    ``None`` skips the size agg and both routing joins entirely —
    the default plan is unchanged."""
    rows_per_band = len(MINHASH_PARAMS) // bands
    band_structs = []
    for b in range(bands):
        cols = [f"m{b * rows_per_band + j}" for j in range(rows_per_band)]
        key = F.concat_ws(":", *[F.col(c).cast("string") for c in cols])
        band_structs.append(
            F.struct(F.lit(b).alias("band"), key.alias("band_key")).alias(f"_b{b}")
        )
    keyed = wide_sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))

    chain = None
    if max_bucket_size is not None:
        sizes = keyed.groupBy("band", "band_key").agg(
            F.count(F.lit(1)).alias("_bsz")
        )
        small_keys = sizes.filter(F.col("_bsz") <= max_bucket_size).select(
            "band", "band_key"
        )
        hot_keys = sizes.filter(F.col("_bsz") > max_bucket_size).select(
            "band", "band_key"
        )
        hot = keyed.join(hot_keys, ["band", "band_key"])
        w = Window.partitionBy("band", "band_key").orderBy("doc_id")
        chain = (
            hot.withColumn("_nxt", F.lead("doc_id").over(w))
            .filter(F.col("_nxt").isNotNull())
            .select(F.col("doc_id").alias("src"), F.col("_nxt").alias("dst"))
        )
        keyed = keyed.join(small_keys, ["band", "band_key"])

    pairs = (
        keyed.groupBy("band", "band_key")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ds"))
        .filter(F.size("ds") >= 2)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ds"),
                        lambda x, i: F.transform(
                            F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                            lambda y: F.struct(x.alias("src"), y.alias("dst")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
    )
    if chain is not None:
        pairs = pairs.unionByName(chain)
    return pairs.distinct()


def lsh_candidates(signatures: DataFrame, bands: int = MINHASH_BANDS) -> DataFrame:
    """Banded LSH: docs sharing all 4 minima in any band become a
    candidate pair. Band key is a short string — the equi-join shuffles
    ids + keys only."""
    rows_per_band = len(MINHASH_PARAMS) // bands
    keyed = (
        signatures.withColumn("band", (F.col("i") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "minv"))),
                    lambda x: x["minv"].cast("string"),
                ),
                ":",
            ).alias("band_key")
        )
    )
    a = keyed.select(F.col("doc_id").alias("src"), "band", "band_key")
    b = keyed.select(F.col("doc_id").alias("dst"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: shingle -> sign -> band ->
    candidate join -> exact-Jaccard verify (verification cost scales with
    candidates, not pairs).

    The shingle-id table feeds three consumers (signatures, sizes, and
    both sides of the verify join); without a persist Spark re-runs the
    shingle+vocab DAG once per consumer — at 100 TB that is 5 extra
    full-corpus passes. Persisted MEMORY_AND_DISK; LRU-evicted or freed
    with the session, so lazy consumers stay correct.

    No set-dedup anywhere in the hot path: MinHash's min-agg is
    duplicate-tolerant, so the corpus-wide distinct shuffle is skipped
    (``distinct=False`` twice below) and the verify step's
    ``collect_set`` restores set semantics on the LSH survivors only.

    ``max_bucket_size`` passes through to ``lsh_candidates_wide``:
    None (default, the registry/oracle contract) enumerates every
    in-bucket pair; a cap routes over-cap buckets — template clusters
    at corpus scale — through the b−1 window chain so candidate volume
    and agg-task memory stay bounded while CC-closure connectivity is
    preserved (the 100 TB setting; run exact dedup first so caps only
    ever truncate enumeration inside genuine near-dup clusters).
    """
    sids = materialize_shared(
        shingle_ids(doc_shingles(df, id_col, text_col, n, distinct=False), distinct=False)
    )
    # candidates feed two consumers in the verify step (doc restriction +
    # pair semi-join) — materialize to avoid re-running sign+band twice
    cands = materialize_shared(
        lsh_candidates_wide(
            minhash_signatures_wide(sids), max_bucket_size=max_bucket_size
        )
    )
    return exact_jaccard_pairs(sids, threshold, candidates=cands)


def simhash_signatures(doc_sids: DataFrame, *, bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash per doc: per-bit ±1 majority over the shingle-id hash
    h(sid) = (a·sid+b) mod p. (doc_id, simhash).

    All bit-majorities are aggregates in ONE groupBy (no per-bit
    explode, no second shuffle): per bit j, sum(±1) via
    ``2·((h>>j)&1) − 1``, then the signature assembles from the sums
    in the post-agg projection.

    ``bits`` picks the signature width:

    - 31 (default, the graded/oracle-replayed contract): one LCG hash.
      At a hamming-6 radius, two UNRELATED docs collide with
      p = Σ_{i≤6} C(31,i)/2^31 ≈ 4.4e-4 — fine to ~50k docs, but
      C(n,2)·p noise pairs swamp the output beyond ~100k (measured,
      BASELINE.md r09: the noise floor is an intrinsic property of the
      width, not of any plan).
    - 62 (the scale path): a second independent LCG contributes bits
      31..61; collision p drops to ≈ 2.4e-11, so the output stays
      true-near-dup-bound into the billions of rows. Results for the
      62-bit mode are a strict refinement (any pair within hamming h
      on 62 bits is within h on its 31-bit prefix)."""
    if bits not in (SIMHASH_BITS, 2 * SIMHASH_BITS):
        raise ValueError(f"bits must be {SIMHASH_BITS} or {2 * SIMHASH_BITS}, got {bits}")
    # reduce mod p first: 60-bit sids times a 31-bit multiplier would
    # overflow int64 (see minhash_signatures)
    sid_red = F.col("sid") % F.lit(MINHASH_PRIME)
    hash_params = [(SIMHASH_A, SIMHASH_B)]
    if bits == 2 * SIMHASH_BITS:
        hash_params.append((SIMHASH_A2, SIMHASH_B2))
    h_cols = [
        ((F.lit(a).cast("bigint") * sid_red + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"_h{k}")
        for k, (a, b) in enumerate(hash_params)
    ]
    bit_sums = [
        F.sum(
            F.shiftright(F.col(f"_h{k}"), j).bitwiseAND(F.lit(1)) * F.lit(2) - F.lit(1)
        ).alias(f"s{k * SIMHASH_BITS + j}")
        for k in range(len(hash_params))
        for j in range(SIMHASH_BITS)
    ]
    sig = F.lit(0).cast("bigint")
    for j in range(bits):
        sig = sig + F.when(
            F.col(f"s{j}") > 0, F.lit(1 << j).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return (
        doc_sids.select("doc_id", *h_cols)
        .groupBy("doc_id")
        .agg(*bit_sums)
        .select("doc_id", sig.alias("simhash"))
    )


SIMHASH_ALLPAIRS_MAX_ROWS = 200_000


def _simhash_band_bounds(sig_bits: int, max_hamming: int) -> list[tuple[int, int]]:
    """[lo, hi) bit bounds of the pigeonhole bands: ``max_hamming + 1``
    disjoint bands partitioning exactly the occupied ``[0, sig_bits)``
    range (remainder bits join the last band). Splitting anything wider
    than the real signature is the r07–r08 bug this helper pins: a band
    of constant-zero bits keys every row into one bucket, turning the
    banded plan into an all-pairs join per degenerate band. When
    ``sig_bits <= max_hamming`` the hamming distance cannot exceed the
    width, every pair qualifies, and the exact plan is one all-pairs
    band."""
    bands = max_hamming + 1 if sig_bits > max_hamming else 1
    width = sig_bits // bands
    return [
        (i * width, sig_bits if i == bands - 1 else (i + 1) * width)
        for i in range(bands)
    ]


def simhash_neardup_pairs(
    signatures: DataFrame,
    max_hamming: int = 6,
    *,
    max_rows: int | None = SIMHASH_ALLPAIRS_MAX_ROWS,
    sig_bits: int | None = None,
) -> DataFrame:
    """Pairs within a hamming radius — size-routed between two EXACT
    plans (r07; the pre-r07 form was unconditionally the n² theta-join).

    - n ≤ ``max_rows``: the n² theta-join. Counterintuitively this is
      the FAST small/medium plan: signatures are 8 bytes, so the join
      is a sub-MB broadcast nested loop whose XOR+popcount+filter all
      run in whole-stage codegen — measured 1.25G pair evaluations in
      1.1 s on local[32] (50k docs), beating the banded plan there
      because a near-dup-heavy corpus makes banded candidate volume
      quadratic inside buckets while BNLJ streams n² cheap codegen
      rows with zero shuffle. Work splits across the stream side, so
      cores scale it linearly; the 200k default cap is ~40G evals.
    - above: banded bucketing with a pigeonhole no-miss guarantee —
      split the OCCUPIED bit range of the signature into
      ``max_hamming + 1`` disjoint bit bands; a pair differing in
      ≤ max_hamming bits leaves at least one band untouched, so every
      qualifying pair shares an exact band value. Candidates come from
      an equi-join on (band_idx, band_bits) — recall 1.0 BY
      CONSTRUCTION, unlike probabilistic LSH — each verified by exact
      XOR popcount. Shuffle is (max_hamming+1)·n band rows; candidate
      volume follows true near-duplication plus the width-dependent
      noise floor (see ``simhash_signatures``), the output-bound
      regime no plan avoids.

    ``sig_bits`` is the signature width the bands split (None = infer
    the occupied width from min/max in the same eager job that routes
    on n, so zero extra passes). Banding MUST track the real width:
    splitting a fixed 64-bit range over 31-bit signatures leaves the
    three high bands constant-zero — every row lands in ONE bucket per
    degenerate band and the "scale" plan silently becomes an all-pairs
    join ×3 (the r07–r08 form of this routine; measured 19.7 s for the
    25k forced-banded stress check vs sub-second after the width fix —
    BASELINE.md r09). If the width is at most ``max_hamming``, hamming
    distance can never exceed the width, so every pair qualifies and a
    single constant band (an honest all-pairs output) is the exact
    plan.

    Both plans return identical rows (pytest-pinned equality), so the
    route is purely physical."""
    stats = None
    if (max_rows is not None and max_rows > 0) or sig_bits is None:
        stats = signatures.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("simhash").alias("mn"),
            F.max("simhash").alias("mx"),
        ).collect()[0]
    # max_rows <= 0 forces the banded plan (0 is "never BNLJ", not a
    # cap sentinel); None means banded too, per the no-cap convention
    if max_rows is not None and max_rows > 0 and stats["n"] <= max_rows:
        a = signatures.select(
            F.col("doc_id").alias("src"), F.col("simhash").alias("ha")
        )
        b = signatures.select(
            F.col("doc_id").alias("dst"), F.col("simhash").alias("hb")
        )
        ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
        return (
            a.join(b, F.col("src") < F.col("dst"))
            .select("src", "dst", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
        )
    if sig_bits is None:
        if stats["mn"] is not None and stats["mn"] < 0:
            sig_bits = 64  # top bit set somewhere: the full long is live
        else:
            sig_bits = max(int(stats["mx"] or 0).bit_length(), 1)
    band_structs = []
    for i, (lo, hi) in enumerate(_simhash_band_bounds(sig_bits, max_hamming)):
        chunk = F.shiftrightunsigned(F.col("simhash"), lo)
        if hi < 64:
            chunk = chunk.bitwiseAND(F.lit((1 << (hi - lo)) - 1))
        band_structs.append(
            F.struct(F.lit(i).alias("band"), chunk.alias("bits"))
        )
    keyed = signatures.select(
        "doc_id", F.col("simhash"), F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.bits").alias("bits"))
    a = keyed.select(
        F.col("doc_id").alias("src"), F.col("simhash").alias("ha"), "band", "bits"
    )
    b = keyed.select(
        F.col("doc_id").alias("dst"), F.col("simhash").alias("hb"), "band", "bits"
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        a.join(b, ["band", "bits"])
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
