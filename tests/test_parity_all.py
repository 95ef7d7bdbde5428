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
