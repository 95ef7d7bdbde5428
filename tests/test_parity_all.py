"""Mirror of the driver's correctness gate: every registered query vs
its DuckDB oracle at sf0.01 (value-level, order-insensitive)."""

from __future__ import annotations

import pytest

from bigdataamazon_spark import queries as registry
from tests.parity import compare


def _names():
    return sorted(registry.queries())


@pytest.mark.parametrize("name", _names())
def test_parity(spark, sf_correctness, name):
    problems = compare(spark, name, sf_correctness)
    assert not problems, "\n".join(problems)
    # an empty result hash-matches an empty oracle VACUOUSLY — a broken
    # predicate on both sides reads as green (caught once: a churn
    # definition no testdata user could ever satisfy). Every registered
    # query must produce rows at sf0.01.
    n = registry.queries()[name](spark, sf_correctness).count()
    assert n > 0, f"{name}: empty result at sf0.01 (vacuous parity)"
