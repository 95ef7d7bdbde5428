"""Unit semantics for the text-prep additions: PII redaction, chunking,
and deterministic shard assignment (operators/textops.py,
operators/sampling.py). Registry parity covers the corpus-scale runs;
these pin the hand-checkable edge cases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataamazon_spark.operators import sampling, textops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_redact_masks_and_counts(spark):
    df = _docs(
        spark,
        [
            (1, "mail a.b+c@ex-ample.org and 192.168.0.1 then 555-123-4567 ok"),
            (2, "no pii here, just 1.2 numbers and a dash-word"),
            (3, "two mails x@y.io z@w.co one ip 10.0.0.7"),
        ],
    )
    out = {r["doc_id"]: r for r in textops.pii_redact(df).collect()}
    assert (out[1]["n_emails"], out[1]["n_ipv4"], out[1]["n_phones"]) == (1, 1, 1)
    assert out[1]["redacted"] == "mail <EMAIL> and <IP> then <PHONE> ok"
    assert (out[2]["n_emails"], out[2]["n_ipv4"], out[2]["n_phones"]) == (0, 0, 0)
    assert out[2]["redacted"] == "no pii here, just 1.2 numbers and a dash-word"
    assert (out[3]["n_emails"], out[3]["n_ipv4"]) == (2, 1)
    assert out[3]["redacted"] == "two mails <EMAIL> <EMAIL> one ip <IP>"


def test_chunking_covers_text_exactly(spark):
    text = "abcdefghij" * 25  # 250 chars
    df = _docs(spark, [(7, text), (8, "short"), (9, "")])
    out = textops.chunk_documents(df, size=100, stride=60).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 7: starts 0,60,120,180,240 -> lens 100,100,100,70,10
    c7 = sorted(by_doc[7], key=lambda r: r["chunk_id"])
    assert [r["chunk_start"] for r in c7] == [0, 60, 120, 180, 240]
    assert [r["chunk_len"] for r in c7] == [100, 100, 100, 70, 10]
    # strided chunks overlap, and their union covers every char:
    # last chunk reaches the final char exactly
    assert c7[-1]["chunk_start"] + c7[-1]["chunk_len"] == len(text)
    # short doc -> one whole-text chunk; empty doc -> one empty chunk
    assert [(r["chunk_start"], r["chunk_len"]) for r in by_doc[8]] == [(0, 5)]
    assert [(r["chunk_start"], r["chunk_len"]) for r in by_doc[9]] == [(0, 0)]


def test_shard_assignments_deterministic_and_dense(spark):
    df = spark.range(0, 500).select(F.col("id").alias("k"))
    a = sampling.shard_assignments(df, "k", n_shards=4)
    rows = a.collect()
    assert len(rows) == 500
    # positions are dense 1..n within every shard
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) == {0, 1, 2, 3}
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # identical assignment regardless of input partitioning (the
    # property rand()-based shuffles lack)
    b = sampling.shard_assignments(df.repartition(13), "k", n_shards=4)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, b.collect()))


def test_asof_join_semantics(spark):
    from bigdataamazon_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(1, 10, "p1"), (1, 20, "p2"), (2, 5, "p3")],
        "k long, ts long, pname string",
    )
    right = spark.createDataFrame(
        [(1, 10, "s_at_10"), (1, 15, "s_at_15"), (3, 1, "other_key")],
        "k long, ts long, sname string",
    )
    out = {r["pname"]: r for r in asof_join(left, right, "k", "ts").collect()}
    # equal ts matches (inclusive <=)
    assert out["p1"]["r_sname"] == "s_at_10" and out["p1"]["r_ts"] == 10
    # latest prior wins, not the earliest
    assert out["p2"]["r_sname"] == "s_at_15"
    # left-outer: no right row for key 2 -> nulls
    assert out["p3"]["r_sname"] is None and out["p3"]["r_ts"] is None


# --- property tests (hypothesis): random inputs vs independent references


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_asof_events = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 50)), min_size=0, max_size=25
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_asof_events, right=_asof_events)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    import pandas as pd

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)] or [(0, -1, -1)],
        "k long, ts long, lid long",
    )
    # dedupe right to one row per (k, ts): with duplicate keys both
    # merge_asof and the window's last() would be pick-dependent
    rpd = (
        pd.DataFrame([(k, t, i) for i, (k, t) in enumerate(right)] or [(9, -1, -1)],
                     columns=["k", "ts", "rid"])
        .sort_values(["k", "ts", "rid"])
        .drop_duplicates(["k", "ts"], keep="last")
    )
    rdf = spark.createDataFrame(rpd, "k long, ts long, rid long")
    lpd = ldf.toPandas().sort_values(["ts", "lid"])
    expected = pd.merge_asof(
        lpd, rpd.sort_values("ts"), on="ts", by="k", direction="backward"
    )
    from bigdataamazon_spark.operators.relational import asof_join

    got = {r["lid"]: r["r_rid"] for r in asof_join(ldf, rdf, "k", "ts").collect()}
    for _, row in expected.iterrows():
        want = None if pd.isna(row["rid"]) else int(row["rid"])
        assert got[int(row["lid"])] == want


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(st.text(alphabet="abc ", max_size=40), min_size=1, max_size=8),
    size=st.integers(1, 10),
    stride=st.integers(1, 10),
)
def test_chunking_matches_python_reference(spark, texts, size, stride):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_start"], r["chunk_len"])
        for r in textops.chunk_documents(df, size=size, stride=stride).collect()
    )
    want = []
    for i, t in enumerate(texts):
        starts = range(0, max(len(t), 1), stride)
        for cid, s in enumerate(starts):
            want.append((i, cid, s, len(t[s : s + size])))
    assert got == sorted(want)


def test_segment_dedup_edges(spark):
    # doc 1 and 2 share their first 3-word segment (boilerplate); doc 3
    # is unique; doc 4 is ONLY boilerplate -> empty clean_text, kept row
    rows = [
        (1, "a b c x y z tail"),          # segs: "a b c","x y z","tail"
        (2, "a b c p q r"),               # segs: "a b c","p q r"
        (3, "u v w"),                     # unique single segment
        (4, "a b c"),                     # fully boilerplate
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in textops.segment_dedup(df, seg_words=3).collect()
    }
    assert out[1]["clean_text"] == "x y z tail" and out[1]["n_removed"] == 1
    assert out[1]["n_segments"] == 3  # trailing partial segment counts
    assert out[2]["clean_text"] == "p q r"
    assert out[3]["clean_text"] == "u v w" and out[3]["n_removed"] == 0
    assert out[4]["clean_text"] == "" and out[4]["n_removed"] == 1
    assert len(out) == 4  # fully-removed docs stay present


def test_centroid_agg_exact(spark):
    from bigdataamazon_spark.functions import vector

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, [3.0, 6.0]), (1, [5.0, 5.0])],
        "label int, embedding array<double>",
    )
    got = {
        r["label"]: r["centroid"]
        for r in df.groupBy("label")
        .agg(vector.centroid_agg("embedding", 2).alias("centroid"))
        .collect()
    }
    assert got[0] == [2.0, 4.0] and got[1] == [5.0, 5.0]


def test_binned_range_join_matches_naive(spark):
    from bigdataamazon_spark.operators import relational

    facts = spark.range(0, 500).select((F.col("id") * 7 % 400).cast("double").alias("v"))
    iv = spark.createDataFrame(
        [(1, 0.0, 50.0), (2, 25.0, 130.0), (3, 390.0, 1000.0), (4, 600.0, 700.0)],
        "iid int, lo double, hi double",
    )
    got = sorted(
        (r["iid"], r["v"])
        for r in relational.binned_range_join(facts, "v", iv, "lo", "hi", 64.0).collect()
    )
    want = sorted(
        (r["iid"], r["v"])
        for r in facts.crossJoin(iv)
        .filter((F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")))
        .collect()
    )
    assert got == want and len(got) > 0


def test_gopher_rules_fire_on_edge_docs(spark):
    """Hand-built docs exercise each rule: a long clean doc keeps, a
    symbol-laden doc fails symbol_ratio, a short doc fails word count."""
    from bigdataamazon_spark.operators.textops import gopher_quality

    clean = "the fast " + " ".join(f"quality{i} and of the data" for i in range(12))
    symbolic = "the of and be " + "# " * 20
    short = "the of and be nice"
    df = spark.createDataFrame(
        [(1, clean), (2, symbolic), (3, short)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in gopher_quality(df).collect()}
    assert rows[1]["keep"] is True
    assert rows[2]["symbol_ratio"] > 0.1 and rows[2]["keep"] is False
    assert rows[3]["n_words"] < 50 and rows[3]["keep"] is False


def test_gopher_structure_injection_line_rules(spark):
    """doc_id 35 (div by 5 and 7): bullet prefix + trailing ellipsis both
    injected -> the single first line starts with '- ' and some line ends
    with '...'; fractions reflect the injected newlines at ' the '."""
    from bigdataamazon_spark.operators.textops import gopher_quality

    text = "alpha the beta the gamma"
    df = spark.createDataFrame([(35, text)], ["doc_id", "text"])
    r = gopher_quality(df).collect()[0]
    # injected: '- alpha\nthe beta\nthe gamma see more...' -> 3 lines
    assert abs(r["bullet_line_frac"] - 1 / 3) < 1e-6
    assert abs(r["ellipsis_line_frac"] - 1 / 3) < 1e-6


def test_unicode_nfc_composes_injected_sequences(spark):
    """Even ids get e+U+0301 injected; NFC must compose them so the
    normalized form is shorter and flagged changed, while odd ids pass
    through untouched."""
    from bigdataamazon_spark.operators.textops import unicode_nfc_stats

    df = spark.createDataFrame(
        [(2, "merge fast key"), (3, "merge fast key")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in unicode_nfc_stats(df).collect()}
    # 'merge' has 2 e's, 'key' has 1 -> 3 injected combining marks
    assert rows[2]["n_chars_raw"] == len("merge fast key") + 3
    assert rows[2]["n_chars_nfc"] == len("merge fast key")
    assert rows[2]["changed"] is True
    assert rows[3]["changed"] is False
    assert rows[3]["n_chars_raw"] == rows[3]["n_chars_nfc"] == len("merge fast key")


def test_bpe_learn_merges_hand_corpus(spark):
    """Classic BPE example: {low x3, lower, lowest}. Round 1 ties (l,o)
    and (o,w) at 5 -> lexicographic tiebreak picks (l,o); then (lo,w);
    then (low,e)."""
    from bigdataamazon_spark.operators.textops import bpe_learn_merges

    df = spark.createDataFrame(
        [(1, "low low low lower lowest")], ["doc_id", "text"]
    )
    merges = bpe_learn_merges(df, rounds=3)
    assert merges == [(1, "l", "o", 5), (2, "lo", "w", 5), (3, "low", "e", 2)]


def test_whitespace_class_pinned_across_engines(spark):
    """Spark (Java regex) and DuckDB (RE2) must tokenize IDENTICALLY on
    every whitespace character — including \\x0B (vertical tab), which
    Java's \\s contains and RE2's does not. Both sides are pinned to the
    explicit class [ \\t\\n\\r\\f\\x0B] (ADVICE r08); this runs the nasty
    string through both engines and compares token lists."""
    import duckdb

    from bigdataamazon_spark.functions import text as textfns

    nasty = "a\x0Bb\tc  d\ne\rf\x0Cg h"
    sdf = spark.createDataFrame([(nasty,)], "text string").select(
        textfns.tokens(F.col("text")).alias("toks")
    )
    spark_toks = sdf.collect()[0]["toks"]
    assert spark_toks == list("abcdefgh")  # Java \s semantics preserved

    duck_toks = duckdb.connect().execute(
        "SELECT list_filter(regexp_split_to_array(?, '[ \\t\\n\\r\\f\\x0B]+'),"
        " x -> x <> '')",
        [nasty],
    ).fetchone()[0]
    assert duck_toks == spark_toks

    # the OLD oracle spelling ('\s+') really does diverge on RE2 —
    # regression guard that the pin is load-bearing, not cosmetic
    old = duckdb.connect().execute(
        "SELECT list_filter(regexp_split_to_array(?, '\\s+'), x -> x <> '')",
        [nasty],
    ).fetchone()[0]
    assert "a\x0bb" in old and old != spark_toks
