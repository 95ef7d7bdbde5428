"""Deterministic sampling + decontamination (operators/sampling.py).

Parity with the DuckDB oracle is covered by the registry sweep; these
pin the operator properties: reproducibility, rate accuracy, stratum
isolation, decontamination semantics, and the zero-shuffle plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataamazon_spark.catalog import load_table
from bigdataamazon_spark.operators import sampling
from bigdataamazon_spark.plans import executed_plan


def test_hash_sample_deterministic_and_rate(spark, sf_correctness):
    ev = load_table(spark, sf_correctness, "events")
    total = ev.count()
    kept1 = sampling.hash_sample(ev, 0.1, "event_id").select("event_id").collect()
    kept2 = sampling.hash_sample(ev, 0.1, "event_id").select("event_id").collect()
    # identical sample across runs (no rand() anywhere)
    assert sorted(r.event_id for r in kept1) == sorted(r.event_id for r in kept2)
    # within ±20% of the nominal rate at n=10k
    assert 0.08 * total <= len(kept1) <= 0.12 * total


def test_hash_sample_seed_changes_sample(spark, sf_correctness):
    ev = load_table(spark, sf_correctness, "events")
    a = {r.event_id for r in sampling.hash_sample(ev, 0.1, "event_id", seed="a").select("event_id").collect()}
    b = {r.event_id for r in sampling.hash_sample(ev, 0.1, "event_id", seed="b").select("event_id").collect()}
    # different seeds draw essentially independent samples
    assert a != b
    assert len(a & b) < 0.5 * max(len(a), len(b))


def test_hash_sample_plan_has_no_exchange(spark, sf_correctness):
    ev = load_table(spark, sf_correctness, "events")
    plan = executed_plan(sampling.hash_sample(ev, 0.1, "event_id").select("event_id"))
    # a sampler must stay a narrow filter: no shuffle at any scale
    assert "Exchange" not in plan


def test_mixture_sample_respects_strata(spark, sf_correctness):
    docs = load_table(spark, sf_correctness, "documents")
    rates = {"en": 1.0, "zh": 0.0}
    out = sampling.mixture_sample(docs, rates, "lang", "doc_id").select("lang")
    langs = {r.lang for r in out.collect()}
    # rate 1.0 keeps every row, rate 0.0 and default 0.0 keep none
    assert langs == {"en"}
    n_en = docs.filter(F.col("lang") == "en").count()
    assert out.count() == n_en


def test_decontaminate_removes_overlap_keeps_rest(spark, sf_correctness):
    docs = load_table(spark, sf_correctness, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    survivors = sampling.decontaminate(corpus, bench, n=5)
    survivor_ids = {r.doc_id for r in survivors.select("doc_id").collect()}
    # no benchmark doc leaks into the output
    bench_ids = {r.doc_id for r in bench.select("doc_id").collect()}
    assert not (survivor_ids & bench_ids)
    # a doc sharing a verbatim 5-gram with the benchmark is dropped:
    # plant one by checking the known-contaminated count vs corpus size
    n_corpus = corpus.count()
    n_survive = len(survivor_ids)
    assert n_survive <= n_corpus
    # every dropped doc really shares a 5-gram with the benchmark
    from bigdataamazon_spark.operators.dedup import doc_shingles

    dropped = corpus.join(
        survivors.select("doc_id"), "doc_id", "left_anti"
    )
    if dropped.count():
        hits = (
            doc_shingles(dropped, n=5)
            .join(doc_shingles(bench, n=5).select("shingle").distinct(), "shingle", "left_semi")
            .select("doc_id")
            .distinct()
            .count()
        )
        assert hits == dropped.count()


def test_decontaminate_broadcasts_benchmark(spark, sf_correctness):
    docs = load_table(spark, sf_correctness, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    plan = executed_plan(sampling.decontaminate(corpus, bench, n=5))
    # the benchmark gram set must join broadcast-side: the corpus grams
    # are never shuffled for candidate detection
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_weighted_sample_drops_nonpositive_weights(spark):
    """w <= 0 must be excluded, not silently inverted: pow(u, 1/0)=inf
    and a negative w would make the LOWEST-weight rows win."""
    rows = [(i, float(w)) for i, w in enumerate([5.0, 0.0, -3.0, 2.0, 1.0, 4.0])]
    df = spark.createDataFrame(rows, ["k", "w"])
    got = {r["k"] for r in sampling.weighted_sample(df, 4, "k", "w").collect()}
    assert got == {0, 3, 4, 5}  # every positive-weight row, no w<=0 row
