from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_smoke(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert set(df.columns) == {"src", "dst", "score", "rank"}


def test_registry_consistency():
    mod = _load_entry()
    q = mod.queries()
    o = mod.oracle_sql()
    assert q, "no queries registered"
    assert set(o).issubset(set(q)), "oracle for unknown query"
