"""Python UDTF surface (§2.10): content-defined chunking."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataamazon_spark.catalog import load_table
from bigdataamazon_spark.operators import udtfs


def test_cdc_chunks_reassemble_to_input(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    chunks = udtfs.cdc_chunks(spark, docs)
    rebuilt = (
        chunks.orderBy("doc_id", "chunk_idx")
        .groupBy("doc_id")
        .agg(F.concat_ws("", F.collect_list("chunk")).alias("rebuilt"))
    )
    joined = docs.join(rebuilt, "doc_id").filter(F.col("text") != F.col("rebuilt"))
    assert joined.count() == 0


def test_cdc_boundary_rule_and_realignment(spark):
    # every non-final chunk ends where the trailing 4-gram sum % 7 == 0
    text = "the quick brown fox jumps over the lazy dog" * 3
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = udtfs.cdc_chunks(spark, df).orderBy("chunk_idx").collect()
    pos = 0
    for r in rows[:-1]:
        pos += len(r.chunk)
        window = text[pos - 4 : pos]
        assert sum(ord(c) for c in window) % udtfs.CDC_MODULUS == 0
    # CDC's point: a prefix insertion only perturbs chunks up to the
    # first post-insertion boundary — the suffix chunk stream realigns
    shifted = "XY" + text
    df2 = spark.createDataFrame([(1, shifted)], "doc_id long, text string")
    rows2 = udtfs.cdc_chunks(spark, df2).orderBy("chunk_idx").collect()
    tail1 = [r.chunk for r in rows[1:]]
    tail2 = [r.chunk for r in rows2[1:]]
    n = min(len(tail1), len(tail2))
    assert tail1[-n + 1 :] == tail2[-n + 1 :]


def test_cdc_plan_is_single_stage_fanout(spark, sf_dir):
    # scan -> BatchEvalPythonUDTF, no exchange: the fan-out must stay
    # partition-parallel at 100 TB
    from bigdataamazon_spark.plans import executed_plan

    docs = load_table(spark, sf_dir, "documents")
    plan = executed_plan(udtfs.cdc_chunks(spark, docs))
    assert "BatchEvalPythonUDTF" in plan
    assert "Exchange" not in plan


def test_cdc_empty_and_short_text(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "ab"), (3, None)], "doc_id long, text string"
    )
    rows = udtfs.cdc_chunks(spark, df).collect()
    # empty/null fan out to zero rows; short text -> one whole-text chunk
    assert [(r.doc_id, r.chunk_idx, r.chunk) for r in rows] == [(2, 1, "ab")]


def test_polymorphic_udtf_schema_follows_argument(spark):
    """analyze() makes the UDTF schema a function of the literal arg:
    n=2 and n=4 produce different, fully typed relations."""
    from pyspark.sql.functions import lit, udtf

    from bigdataamazon_spark.operators.udtfs import SplitFixedUDTF

    split_fixed = udtf(SplitFixedUDTF)
    spark.udtf.register("graft_split_fixed", split_fixed)
    two = spark.sql("SELECT * FROM graft_split_fixed('a,b,c', 2)")
    assert two.columns == ["c0", "c1"]
    assert [tuple(r) for r in two.collect()] == [("a", "b")]
    four = spark.sql("SELECT * FROM graft_split_fixed('a,b', 4)")
    assert four.columns == ["c0", "c1", "c2", "c3"]
    assert [tuple(r) for r in four.collect()] == [("a", "b", None, None)]


def test_polymorphic_udtf_rejects_non_literal_n(spark):
    import pytest as _pytest
    from pyspark.sql.functions import udtf

    from bigdataamazon_spark.operators.udtfs import SplitFixedUDTF

    spark.udtf.register("graft_split_fixed2", udtf(SplitFixedUDTF))
    with _pytest.raises(Exception):
        spark.sql("SELECT * FROM graft_split_fixed2('a', -1)").collect()
