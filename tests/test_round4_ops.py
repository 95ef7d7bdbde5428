"""Round-4 operator properties beyond the parity sweep: the distributed
numbering/ntile helpers, guarantee claims (pivot pruning, SymSpell
completeness), and digest invariance."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdataamazon_spark import queries as registry


def _ntile_formula(seq: int, n: int, k: int = 4) -> int:
    """The integer-arithmetic ntile used by curriculum_phase_stats."""
    import math

    big = n // k + 1
    n_big = n % k
    if seq <= n_big * big:
        return math.ceil(seq / big)
    return n_big + math.ceil((seq - n_big * big) / (big - 1))


@given(st.integers(min_value=1, max_value=500))
@settings(max_examples=60, deadline=None)
def test_ntile_formula_matches_sql_semantics(n):
    """SQL ntile(k): first n%k buckets get ceil(n/k) rows, the rest get
    floor(n/k) — the remainder rule the distributed form must replicate
    exactly for every n, not just the sf0.01 row count."""
    k = 4
    sizes = [0] * (k + 1)
    for seq in range(1, n + 1):
        b = _ntile_formula(seq, n, k)
        assert 1 <= b <= k
        sizes[b] += 1
    expected_big, n_big = n // k + 1, n % k
    for b in range(1, k + 1):
        if n < k:
            continue  # fewer rows than buckets: leading buckets get 1
        assert sizes[b] == (expected_big if b <= n_big else n // k)
    # assignment is monotone non-decreasing in seq
    assert all(
        _ntile_formula(s, n, k) <= _ntile_formula(s + 1, n, k) for s in range(1, n)
    )


def test_global_seq_equals_row_number(spark):
    """_global_seq must reproduce row_number() OVER (ORDER BY key) for
    any partition count — the range boundaries the sampler picks must
    not matter."""
    from bigdataamazon_spark.queries import _global_seq

    data = [(int(x),) for x in (7, 3, 11, 1, 9, 2, 15, 8, 4, 20, 13, 6)]
    df = spark.createDataFrame(data, "doc_id bigint")
    expected = {x: i + 1 for i, x in enumerate(sorted(v for (v,) in data))}
    for parts in (1, 3, 8):
        got = {
            r["doc_id"]: r["seq"]
            for r in _global_seq(df, ["doc_id"], parts=parts).collect()
        }
        assert got == expected, f"parts={parts}"


def test_pivot_pruning_never_misses(spark, sf_dir):
    """The triangle-inequality guarantee: no within-radius neighbor may
    be pruned, at any SF."""
    row = registry.queries()["pivot_pruned_ann_audit"](spark, sf_dir).collect()[0]
    assert row["n_missed"] == 0
    assert row["n_candidates"] >= row["n_within_r"]


def test_symspell_probes_all_match_within_one_edit(spark, sf_dir):
    """Every probe is a catalog name with one deleted character, so the
    deletion-neighborhood join must find a home for ALL of them with
    lev <= 1 (completeness of the candidate generation)."""
    from bigdataamazon_spark.catalog import load_table

    probes = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 50 == 0)
        .count()
    )
    out = registry.queries()["symspell_part_matches"](spark, sf_dir).collect()
    assert len(out) == probes
    assert all(r["lev"] <= 1 for r in out)


def test_multiset_digest_invariant_under_plan(spark, sf_dir):
    row = registry.queries()["multiset_digest_reconciliation"](
        spark, sf_dir
    ).collect()[0]
    assert row["matches_reordered_copy"] is True


def test_retractable_merge_drops_emptied_groups(spark, sf_dir):
    """Every maintained group must keep a positive count — the
    retraction rule; and the merge must equal recompute (parity covers
    values, this pins the invariant at other SFs)."""
    rows = registry.queries()["retractable_agg_maintenance"](spark, sf_dir).collect()
    assert all(r["n_orders"] > 0 for r in rows)


@pytest.mark.parametrize(
    "name,col",
    [
        ("community_modularity_audit", "modularity_contribution"),
        ("revenue_cusum_changepoint", "cusum"),
        ("heaps_law_fit", "heaps_beta"),
    ],
)
def test_cancellation_zero_normalized_positive(spark, sf_correctness, name, col):
    """Round-5 ±0.0 flake fix (r04 verdict #1): entries whose rounded
    value is a cancellation of float sums must emit +0.0, never -0.0 —
    on BOTH engines — or the driver hash flips with shuffle order."""
    import math

    from tests.parity import run_duckdb

    sdf = registry.queries()[name](spark, sf_correctness).toPandas()
    ddf = run_duckdb(registry.oracle_sql()[name], sf_correctness)
    for df, side in ((sdf, "spark"), (ddf, "duckdb")):
        for v in df[col].dropna():
            if v == 0.0:
                assert math.copysign(1.0, v) > 0, f"-0.0 leaked on {side}"
