"""Full-Porter stemmer: Python implementation vs the generated DuckDB
SQL replay (functions/porter_sql.py). These two are what the driver
hash-compares inside ``stemmed_word_freq``, so their equivalence is
pinned three ways: golden outputs of the published algorithm,
hypothesis-generated adversarial words (digits, y-runs, marker-collision
letters), and the full corpus vocabulary at sf0.01.

No Spark needed here — the Spark side applies ``porter_stem`` through a
pandas_udf verbatim; what can drift is Python-vs-SQL, tested directly
in DuckDB."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdataamazon_spark.functions.porter_sql import pool_case_sql, porter_ctes
from bigdataamazon_spark.operators.stemming import porter_stem, porter_stem_nltk

# Canonical outputs of the original algorithm (examples from the 1980
# paper's rule lists plus the reference's docstring example running->run).
GOLDEN = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky", "running": "run",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "triplicate": "triplic", "formative": "form",
    "formalize": "formal", "electriciti": "electr", "electrical": "electr",
    "hopeful": "hope", "goodness": "good", "revival": "reviv",
    "allowance": "allow", "inference": "infer", "airliner": "airlin",
    "gyroscopic": "gyroscop", "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
}


def _sql_stems(words: list[str], mode: str = "paper") -> dict[str, str]:
    con = duckdb.connect()
    con.execute("CREATE TABLE wt(w0 VARCHAR, n BIGINT, w VARCHAR)")
    con.executemany("INSERT INTO wt VALUES (?, 1, ?)", [(w, w) for w in words])
    ctes, final = porter_ctes("wt", mode)
    stem_expr = "CASE WHEN length(w0) <= 2 THEN w0 ELSE w END"
    if mode == "nltk":
        stem_expr = pool_case_sql("w0", stem_expr)
    sql = "WITH " + ctes.strip() + f" SELECT w0, {stem_expr} FROM {final}"
    return dict(con.execute(sql).fetchall())


def test_porter_golden():
    bad = {w: (porter_stem(w), e) for w, e in GOLDEN.items() if porter_stem(w) != e}
    assert not bad, bad


def test_sql_matches_python_on_golden_vocab():
    words = sorted(GOLDEN)
    got = _sql_stems(words)
    bad = {w: (porter_stem(w), got[w]) for w in words if porter_stem(w) != got[w]}
    assert not bad, bad


# marker-collision letters (v/c/x), digits, and y-runs are the failure
# modes the SQL emitter could plausibly get wrong — bias toward them.
WORD = st.text(
    alphabet="abceiouvcxyz01y",
    min_size=1,
    max_size=16,
)


@given(words=st.lists(WORD, min_size=1, max_size=40, unique=True))
@settings(max_examples=40, deadline=None)
def test_sql_matches_python_on_generated_words(words):
    got = _sql_stems(words)
    bad = {w: (porter_stem(w), got[w]) for w in words if porter_stem(w) != got[w]}
    assert not bad, bad


def test_sql_matches_python_on_corpus_vocab(sf_correctness):
    con = duckdb.connect()
    vocab = [
        r[0]
        for r in con.execute(
            "SELECT DISTINCT w FROM (SELECT unnest(string_split(text, ' ')) AS w "
            f"FROM read_parquet('{sf_correctness}/documents.parquet')) WHERE w <> ''"
        ).fetchall()
    ]
    got = _sql_stems(vocab)
    bad = {w: (porter_stem(w), got[w]) for w in vocab if porter_stem(w) != got[w]}
    assert not bad, f"{len(bad)} corpus vocab mismatches: {dict(list(bad.items())[:10])}"


# ---------------------------------------------------------------------------
# NLTK_EXTENSIONS mode (r08 verdict #5 — the contract DECISION: the
# deltas are implemented behind mode='nltk' on both sides; paper mode
# stays the default everywhere). Expected values re-derived from NLTK's
# published porter.py semantics — no nltk import.
# ---------------------------------------------------------------------------

# the verdict's fixture trio first, then the NLTK docstring demo words
# and every irregular-form pool entry.
GOLDEN_NLTK = {
    "ties": "tie", "toy": "toy", "enjoyed": "enjoy",
    "caresses": "caress", "flies": "fli", "dies": "die", "mules": "mule",
    "denied": "deni", "died": "die", "agreed": "agre", "owned": "own",
    "humbled": "humbl", "sized": "size", "meeting": "meet",
    "stating": "state", "siezing": "siez", "itemization": "item",
    "sensational": "sensat", "traditional": "tradit",
    "reference": "refer", "colonizer": "colon", "plotted": "plot",
    "sky": "sky", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "news": "news", "innings": "inning",
    "outings": "outing", "cannings": "canning", "howe": "howe",
    "proceed": "proceed", "exceed": "exceed", "succeed": "succeed",
    "crying": "cri", "happy": "happi", "running": "run",
    "cement": "cement", "really": "realli", "gratefulli": "grate",
    "abli": "abli", "triumphantli": "triumphantli",
}

# the documented paper-vs-NLTK divergence classes (SURVEY §2.7): the
# same inputs under BOTH modes, pinning each side's contract.
DIVERGENCE = {
    "ties": ("ti", "tie"),
    "toy": ("toi", "toy"),
    "enjoyed": ("enjoi", "enjoy"),
    "sky": ("sky", "sky"),        # paper: 1a leaves it, no rule fires
    "dying": ("dy", "die"),
    "news": ("new", "news"),
    "innings": ("in", "inning"),
}


def test_porter_nltk_golden():
    bad = {
        w: (porter_stem_nltk(w), e)
        for w, e in GOLDEN_NLTK.items()
        if porter_stem_nltk(w) != e
    }
    assert not bad, bad


def test_porter_mode_divergence_table():
    for w, (paper, nltk) in DIVERGENCE.items():
        assert porter_stem(w) == paper, (w, porter_stem(w), paper)
        assert porter_stem_nltk(w) == nltk, (w, porter_stem_nltk(w), nltk)


def test_nltk_sql_matches_python_on_golden_vocab():
    words = sorted(set(GOLDEN_NLTK) | set(GOLDEN) | set(DIVERGENCE))
    got = _sql_stems(words, mode="nltk")
    bad = {
        w: (porter_stem_nltk(w), got[w])
        for w in words
        if porter_stem_nltk(w) != got[w]
    }
    assert not bad, bad


@given(words=st.lists(WORD, min_size=1, max_size=40, unique=True))
@settings(max_examples=40, deadline=None)
def test_nltk_sql_matches_python_on_generated_words(words):
    got = _sql_stems(words, mode="nltk")
    bad = {
        w: (porter_stem_nltk(w), got[w])
        for w in words
        if porter_stem_nltk(w) != got[w]
    }
    assert not bad, bad


def test_nltk_sql_matches_python_on_corpus_vocab(sf_correctness):
    con = duckdb.connect()
    vocab = [
        r[0]
        for r in con.execute(
            "SELECT DISTINCT w FROM (SELECT unnest(string_split(text, ' ')) AS w "
            f"FROM read_parquet('{sf_correctness}/documents.parquet')) WHERE w <> ''"
        ).fetchall()
    ]
    got = _sql_stems(vocab, mode="nltk")
    bad = {
        w: (porter_stem_nltk(w), got[w])
        for w in vocab
        if porter_stem_nltk(w) != got[w]
    }
    assert not bad, f"{len(bad)} mismatches: {dict(list(bad.items())[:10])}"


def test_nltk_alli_recursion_chain():
    # 'morallialli' -> alli pass 1: m('morall')>0 -> 'morallial'?? no:
    # endswith('alli') on 'morallialli' -> 'morallial'... the point is
    # simply: python recursion == sql unroll on nested-alli words.
    words = ["morallialli", "realli", "verticalli", "alli", "xalli"]
    got = _sql_stems(words, mode="nltk")
    bad = {
        w: (porter_stem_nltk(w), got[w])
        for w in words
        if porter_stem_nltk(w) != got[w]
    }
    assert not bad, bad
