"""Mirror of the driver's correctness gate: every registered query vs
its DuckDB oracle at sf0.01 (value-level, order-insensitive)."""

from __future__ import annotations

import pytest

from bigdataamazon_spark import queries as registry
from tests.parity import compare


def _names():
    return sorted(registry.queries())


def test_registry_outputs_are_scalar(spark, sf_dir):
    """Driver-canonicalizer contract: the driver sorts the collected
    pandas frame by every column before hashing, which crashes on
    unhashable cells (lists/dicts/bytearrays). No registered query may
    expose an array/map/struct/binary column — serialize in the
    registered projection instead (cost one round-1 driver row:
    multimodal_features)."""
    import pyspark.sql.types as T

    bad = []
    for name, fn in registry.queries().items():
        for f in fn(spark, sf_dir).schema.fields:
            if isinstance(
                f.dataType, (T.ArrayType, T.MapType, T.StructType, T.BinaryType)
            ):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, "non-scalar registry outputs: " + "; ".join(bad)


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
