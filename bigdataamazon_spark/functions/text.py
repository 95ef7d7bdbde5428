"""Text expression builders (SURVEY.md §2.7 M1/M3 + text-analysis surface).

Everything here is Catalyst-native (split/transform/filter over arrays);
stemming — the one genuinely non-native op — lives in
``operators.stemming`` as a pandas_udf.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The tiny stopword set used by word-frequency / quality queries. The
# reference uses sklearn's english list + custom additions
# (``/root/reference/amazon1.py:105,133``); the testdata vocabulary is
# synthetic, so the engine takes the set as a parameter with this default.
DEFAULT_STOPWORDS = ("the", "a", "an", "and", "of", "to", "in")


def normalize(col: Column | str) -> Column:
    """lowercase + strip punctuation to spaces (``amazon1.py:128``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(c), r"[^a-z0-9 \t\n\r\f\x0B]+", " ")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization -> array<string>, no empty tokens.

    The split class is pinned to the EXPLICIT set [ \\t\\n\\r\\f\\x0B]
    — byte-identical to Java's ASCII ``\\s`` — because DuckDB's RE2
    ``\\s`` lacks ``\\x0B`` (vertical tab); every oracle that replays a
    whitespace split uses the same literal class so the two engines
    tokenize identically on ANY input (ADVICE r08)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"[ \t\n\r\f\x0B]+"), lambda t: t != F.lit(""))


def remove_stopwords(toks: Column, stopwords: tuple[str, ...] = DEFAULT_STOPWORDS) -> Column:
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.filter(toks, lambda t: ~F.array_contains(sw, t))


def word_ngrams(toks: Column, n: int) -> Column:
    """Word-level n-gram shingles as space-joined strings.

    array ['a','b','c'], n=2 -> ['a b','b c']; arrays shorter than n
    yield an empty array. Pure transform/sequence/slice — no UDF.
    (Spark's sequence(1, 0) would count DOWN, so short arrays need the
    explicit WHEN guard.)
    """
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(toks) >= n, grams).otherwise(empty)
