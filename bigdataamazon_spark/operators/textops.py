"""Text-analysis operators over a document table (BASELINE.json surface:
language-ID, quality scoring, token counting, fingerprinting).

All Catalyst-native: higher-order array functions instead of UDFs, so
the whole per-document computation stays inside whole-stage codegen.
These generalize the reference's name-normalization pipeline
(``/root/reference/amazon1.py:128-130``) from product titles to the
``documents`` corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import DEFAULT_STOPWORDS, tokens

FINGERPRINT_MOD = 1_000_000_007

# marker-word tables for the n-gram language heuristic; with a synthetic
# shared-vocabulary corpus only the 'en' row can realistically fire, but
# the operator shape (per-language marker ratio -> argmax) is the real one.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "la", "los", "que"),
    "fr": ("le", "la", "les", "et"),
}


# GPT-2-style pre-tokenizer regex, RE2-safe (no lookahead variant: the
# original's `\s+(?!\S)` trailing-space alternative is dropped so the
# same pattern runs on Spark's Java regex AND DuckDB's RE2 — verified
# to tokenize identically). Counts subword-ish units: contractions,
# space-prefixed letter runs, digit runs, punctuation runs, whitespace.
BPE_PRETOKEN_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^ \t\n\r\f\x0B\p{L}\p{N}]+|[ \t\n\r\f\x0B]+"


def bpe_token_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc BPE-ish token counts next to whitespace counts — the
    budget/pricing measure a training pipeline actually bills by. The
    regex runs JVM-side (``regexp_extract_all``), so the whole operator
    is one codegen'd projection, no Python and no shuffle."""
    ws = tokens(F.col(text_col))
    bpe = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_RE), 0)
    return df.select(
        F.col(id_col),
        F.size(ws).alias("n_ws_tokens"),
        F.size(bpe).alias("n_bpe_tokens"),
        F.round(F.size(bpe).cast("double") / F.size(ws), 6).alias("bpe_per_ws"),
    )


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc token counts: whitespace tokens, distinct tokens, total /
    average token length — one narrow projection, no shuffle at all."""
    toks = tokens(F.col(text_col))
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, v: acc + v
    )
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(total_len.cast("double") / F.size(toks), 6).alias("avg_token_len"),
    )


def stopword_ratio(text_col: Column, stopwords: tuple[str, ...] = DEFAULT_STOPWORDS) -> Column:
    toks = tokens(text_col)
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_stop.cast("double") / F.size(toks)


def quality_scores(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality scoring: length, stopword ratio, lexical
    diversity -> clamped [0,1] score (the shape of a pretraining-data
    quality filter; weights are illustrative constants)."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    diversity = F.size(F.array_distinct(toks)).cast("double") / n_tok
    sw_ratio = stopword_ratio(F.col(text_col))
    score = F.least(
        F.greatest(
            F.lit(0.2)
            + F.lit(0.5) * diversity
            + F.lit(0.5) * sw_ratio
            + F.when(n_tok < 20, -0.3).otherwise(0.0),
            F.lit(0.0),
        ),
        F.lit(1.0),
    )
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        F.round(diversity, 6).alias("diversity"),
        F.round(score, 6).alias("quality"),
    )


def language_guess(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language ID: per-language marker hit ratio, argmax
    with 'und' fallback below a floor. Deterministic and SQL-expressible."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    ratio_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        mk = F.array(*[F.lit(m) for m in markers])
        ratio = F.size(F.filter(toks, lambda t: F.array_contains(mk, t))).cast(
            "double"
        ) / n_tok
        ratio_cols.append((lang, ratio))
    best = F.greatest(*[r for _, r in ratio_cols])
    guess = F.lit("und")
    # later branches win ties in reverse order -> iterate reversed so the
    # alphabetically-first language wins a tied ratio, matching the oracle
    for lang, ratio in reversed(ratio_cols):
        guess = F.when((best >= 0.02) & (ratio == best), lang).otherwise(guess)
    return df.select(
        F.col(id_col),
        guess.alias("lang_guess"),
        F.round(best, 6).alias("marker_ratio"),
    )


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_quality: float = 0.5,
    lang: str = "en",
) -> DataFrame:
    """The end-to-end corpus-curation composition a pretraining pipeline
    runs: quality-score -> language-filter -> exact-dedup, in ONE pass.

    Every metric (token counts, stopword/diversity ratios, quality,
    language argmax) is a native expression over the same tokens()
    array, so the whole filter stage is a single codegen'd projection —
    no joins between "the quality table" and "the language table", no
    re-tokenization per metric (Catalyst CSEs the shared subtrees). The
    only shuffle is the final dedup groupBy on md5(text); survivors are
    a filtered sliver, so that shuffle carries the curated fraction,
    not the corpus. Thresholds compare on round(·, 6) so the cut is
    reproducible across engines (raw-double boundaries are where
    cross-engine jitter lives).
    """
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    diversity = F.size(F.array_distinct(toks)).cast("double") / n_tok
    sw_ratio = stopword_ratio(F.col(text_col))
    quality = F.round(
        F.least(
            F.greatest(
                F.lit(0.2)
                + F.lit(0.5) * diversity
                + F.lit(0.5) * sw_ratio
                + F.when(n_tok < 20, -0.3).otherwise(0.0),
                F.lit(0.0),
            ),
            F.lit(1.0),
        ),
        6,
    )
    ratio_cols = []
    for lg, markers in sorted(LANG_MARKERS.items()):
        mk = F.array(*[F.lit(m) for m in markers])
        ratio = F.size(F.filter(toks, lambda t: F.array_contains(mk, t))).cast(
            "double"
        ) / n_tok
        ratio_cols.append((lg, ratio))
    best = F.greatest(*[r for _, r in ratio_cols])
    guess = F.lit("und")
    for lg, ratio in reversed(ratio_cols):
        guess = F.when((best >= 0.02) & (ratio == best), lg).otherwise(guess)

    scored = df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("content_key"),
        n_tok.alias("n_tokens"),
        quality.alias("quality"),
        guess.alias("lang_guess"),
    ).filter((F.col("quality") >= min_quality) & (F.col("lang_guess") == lang))
    # metrics are pure functions of the text, hence constant within a
    # content_key group — min() picks the (identical) value without a
    # nondeterministic first()
    return (
        scored.groupBy("content_key")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("n_tokens").alias("n_tokens"),
            F.min("quality").alias("quality"),
        )
        .select("keeper_id", "n_copies", "n_tokens", "quality")
    )


# PII patterns, written to parse identically under Java regex (Spark)
# and RE2 (DuckDB): character classes + bounded repeats only, no
# lookaround, no backreferences.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def pii_redact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Regex PII scrub: count and mask emails, IPv4 literals, and
    NNN-NNN-NNNN phone numbers (the minimum redaction pass a
    training-data pipeline runs before anything leaves the raw zone).

    Entirely ``regexp_count`` / ``regexp_replace`` inside whole-stage
    codegen — one narrow projection, no Python, no shuffle, so it
    composes with the scan at any corpus size. Masking order matters:
    emails first (an address can embed digits), then IPs (dotted quads
    would otherwise be half-eaten by the phone pattern), then phones.
    """
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>"),
            PII_IPV4_RE,
            "<IP>",
        ),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return df.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(PII_IPV4_RE)).alias("n_ipv4"),
        F.regexp_count(t, F.lit(PII_PHONE_RE)).alias("n_phones"),
        redacted.alias("redacted"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    size: int = 120,
    stride: int = 80,
) -> DataFrame:
    """Sliding-window character chunking with provenance offsets —
    the context-window prep step between curation and tokenization.

    One generator expression per doc (``sequence`` of starts →
    ``posexplode`` → ``substring``): the fan-out is pipelined inside
    the scan stage, no shuffle, and each output row carries
    (chunk_id, chunk_start) so chunks join back to their source doc
    deterministically. ``stride < size`` gives overlapping chunks.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    t = F.col(text_col)
    starts = F.sequence(
        F.lit(0), F.greatest(F.length(t) - F.lit(1), F.lit(0)), F.lit(stride)
    )
    exploded = df.select(
        F.col(id_col).alias("doc_id"),
        t.alias("_text"),
        F.posexplode(starts).alias("chunk_id", "chunk_start"),
    )
    chunk = F.substring(F.col("_text"), F.col("chunk_start") + 1, size)
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("chunk_start").cast("int").alias("chunk_start"),
        F.length(chunk).cast("int").alias("chunk_len"),
        F.md5(chunk).alias("chunk_hash"),
    )


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wid): dense deterministic word ids (cross-engine stand-in
    for xxhash64 — see operators.dedup docstring)."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .distinct()
        .withColumn("wid", F.row_number().over(Window.orderBy("word")))
    )


def doc_fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Order-sensitive positional fingerprint:
    sum((pos+1) · word_id) mod P — two documents with the same words in
    different order fingerprint differently (unlike bag-of-words)."""
    vocab = word_vocab(df, text_col)
    positions = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "word"),
    )
    return (
        positions.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            ((F.sum((F.col("pos") + 1) * F.col("wid"))) % FINGERPRINT_MOD).alias(
                "fingerprint"
            )
        )
    )


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_words: int = 10,
    max_docs: int = 1,
) -> DataFrame:
    """Cross-document boilerplate removal (CCNet/RefinedWeb-style line
    dedup, generalized to fixed-width word segments since the corpus has
    no newlines): split each document into NON-overlapping ``seg_words``
    windows, drop every segment that occurs in more than ``max_docs``
    distinct documents, and reassemble the survivors in order. This is
    the segment-granular sibling of exact doc dedup (SURVEY §2.3 D2,
    seeded by ``/root/reference/amazon1.py:119-122``) — it removes the
    shared headers/footers exact-doc dedup cannot see.

    Scale shape: the frequent-segment set is small BY CONSTRUCTION
    (boilerplate = few distinct strings with many occurrences), so after
    one hash aggregation over segment hashes the removal is a broadcast
    LEFT ANTI join — the corpus itself is never shuffled, and the
    reassembly groupBy shuffles on the doc id exactly once. Segmentation
    runs as higher-order array functions inside codegen, no UDF.
    """
    words = F.split(F.col(text_col), " ")
    n_segs = F.greatest(
        F.lit(1), F.ceil(F.size(words) / F.lit(seg_words)).cast("int")
    )
    segments = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.array_join(F.slice(words, i * seg_words + 1, seg_words), " "),
    )
    segs = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(segments).alias("pos", "seg"),
    )
    frequent = (
        segs.groupBy("seg")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") > max_docs)
        .select("seg")
    )
    kept = segs.join(F.broadcast(frequent), "seg", "left_anti")
    reassembled = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("int").alias("n_kept"),
    )
    totals = df.select(
        F.col(id_col).alias("doc_id"),
        F.greatest(
            F.lit(1), F.ceil(F.size(F.split(F.col(text_col), " ")) / F.lit(seg_words))
        )
        .cast("int")
        .alias("n_segments"),
    )
    return totals.join(reassembled, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_segments",
        (F.col("n_segments") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
    )


def repetition_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Gopher-style within-document repetition metrics per doc:
    the fraction of n-grams taken by the single most frequent n-gram
    (``top_gram_frac``) and the fraction belonging to any n-gram that
    occurs more than once (``dup_gram_frac``). High values flag
    boilerplate / generated spam for a pretraining quality filter.

    Shape: explode n-grams, count per (doc, gram), then fold to one row
    per doc. Both aggregations partial-aggregate map-side, and both
    shuffle keys carry the doc id, so the second agg is a near-local
    fold of the first. Docs shorter than n tokens have no n-grams and
    drop out (consistent on both engines).
    """
    from ..functions.text import word_ngrams

    grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(tokens(F.col(text_col)), n)).alias("gram"),
    )
    counts = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    total = F.sum("c")
    return counts.groupBy("doc_id").agg(
        total.cast("int").alias("n_grams"),
        F.round(F.max("c") / total, 6).alias("top_gram_frac"),
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)) / total, 6
        ).alias("dup_gram_frac"),
    )


# Gopher-style quality rule pack (Rae et al. 2021, public). The testdata
# corpus is one line of bare lowercase words, so — like pii_redact's
# injected spans — the operator first injects deterministic structure
# (newlines, bullet prefixes, ellipses, symbol tags) keyed on the doc id,
# mirrored verbatim in the DuckDB oracle, so every rule has both firing
# and non-firing documents and the cross-engine check is non-trivial.
GOPHER_REQUIRED_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_structured_text(id_col: Column, text_col: Column) -> Column:
    """Deterministic structure injection: newline before each ' the ',
    bullet prefix (id%5), trailing ellipsis (id%7), symbol tags (id%3).
    Order matters and is mirrored in the oracle CTE."""
    t = F.regexp_replace(text_col, " the ", "\nthe ")
    t = F.when(id_col % 5 == 0, F.concat(F.lit("- "), t)).otherwise(t)
    t = F.when(id_col % 7 == 0, F.concat(t, F.lit(" see more..."))).otherwise(t)
    return F.when(id_col % 3 == 0, F.concat(t, F.lit(" #tag #ref"))).otherwise(t)


def gopher_quality(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher rule-pack: word count, mean word length, symbol-to-word
    ratio, bullet/ellipsis line fractions, alphabetic-word fraction,
    required-stopword hits -> per-rule flags + overall keep. Entirely
    codegen-native (split + higher-order array functions + regexp_count),
    zero shuffle — the 100 TB shape is a narrow projection."""
    sid = F.col(id_col)
    t = gopher_structured_text(sid, F.col(text_col))
    words = tokens(t)
    n_words = F.size(words)
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    mean_len = (
        F.aggregate(F.transform(words, lambda w: F.length(w)), F.lit(0), lambda a, v: a + v)
        .cast("double")
        / n_words
    )
    n_sym = F.regexp_count(t, F.lit("#")) + F.regexp_count(t, F.lit(r"\.\.\."))
    sym_ratio = n_sym.cast("double") / n_words
    bullet_frac = (
        F.size(F.filter(lines, lambda l: l.startswith("- ") | l.startswith("* ")))
        .cast("double")
        / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: l.endswith("..."))).cast("double") / n_lines
    )
    alpha_frac = (
        F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]"))).cast("double") / n_words
    )
    stops = F.array(*[F.lit(s) for s in GOPHER_REQUIRED_STOPS])
    n_req = F.size(F.filter(stops, lambda s: F.array_contains(words, s)))
    keep = (
        (n_words >= 50)
        & (n_words <= 100000)
        & (mean_len >= 3)
        & (mean_len <= 10)
        & (sym_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
        & (alpha_frac >= 0.8)
        & (n_req >= 2)
    )
    return df.select(
        sid,
        n_words.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(sym_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        n_req.alias("n_required_stops"),
        keep.alias("keep"),
    )


import pandas as _pd  # noqa: E402
from pyspark.sql.types import StringType as _StringType  # noqa: E402


# NB: DataType instance (not DDL string) so no SparkContext is needed at
# import time — same note as operators/stemming.py. Module-level because
# pandas_udf resolves the pd.Series string hints via the enclosing
# module's globals.
@F.pandas_udf(_StringType())
def _nfc_udf(s: _pd.Series) -> _pd.Series:
    return s.str.normalize("NFC")


def unicode_nfc_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unicode NFC canonicalization — a real LLM-corpus cleaning step
    with no Catalyst-native equivalent, so it is the canonical
    Arrow-batched pandas_udf shape (like stemming). The testdata corpus
    is pure ASCII, so decomposed sequences (e + U+0301) are injected
    deterministically on even ids, mirrored in the DuckDB oracle via
    ``nfc_normalize`` — the UDF output is value-verified cross-engine,
    not just smoke-tested. Zero shuffle; at 100 TB this is a narrow
    projection whose only cost is the Arrow hop."""
    sid = F.col(id_col)
    raw = F.when(
        sid % 2 == 0, F.regexp_replace(F.col(text_col), "e", "e\u0301")
    ).otherwise(F.col(text_col))
    nfc = _nfc_udf(raw)
    return (
        df.select(sid, raw.alias("raw"), nfc.alias("nfc"))
        .select(
            F.col(id_col),
            F.length("raw").alias("n_chars_raw"),
            F.length("nfc").alias("n_chars_nfc"),
            (F.col("raw") != F.col("nfc")).alias("changed"),
            F.md5(F.col("nfc").cast("binary")).alias("nfc_md5"),
        )
    )


def intra_doc_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_words: int = 5,
) -> DataFrame:
    """Within-document repetition removal (beyond ref; the intra-doc
    sibling of segment_dedup's cross-doc boilerplate pass): split each
    document into non-overlapping ``seg_words`` word segments, keep only
    the FIRST occurrence of each repeated segment, reassemble in order.
    ``array_distinct`` preserves first-occurrence order, so the whole
    operator is one codegen projection — zero shuffle, no UDF, and at
    100 TB it runs entirely inside the scan stage."""
    words = F.split(F.col(text_col), " ")
    n_segs = F.greatest(F.lit(1), F.ceil(F.size(words) / F.lit(seg_words)).cast("int"))
    segments = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.array_join(F.slice(words, i * seg_words + 1, seg_words), " "),
    )
    deduped = F.array_distinct(segments)
    return df.select(
        F.col(id_col),
        F.size(segments).alias("n_segments"),
        F.size(deduped).alias("n_kept"),
        F.array_join(deduped, " ").alias("deduped_text"),
    )


def bpe_learn_merges(
    df: DataFrame,
    rounds: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "list[tuple[int, str, str, int]]":
    """Distributed BPE merge learning (beyond ref; the trainer side of
    bpe_token_stats' pre-tokenizer): the classic algorithm — count
    adjacent symbol pairs over the frequency-weighted word vocabulary,
    merge the argmax, repeat. Each round is one explode + one hash agg
    over the DISTINCT-word table (tiny next to the corpus — that
    weighting trick is what makes cluster-scale BPE training cheap),
    and only the single winning pair rows travel to the driver, exactly
    like the reference pattern of IVF centroid fitting. Ties break
    (count desc, left asc, right asc) so the merge sequence is
    deterministic and SQL-replayable. Returns
    [(rank, left, right, count), ...]."""
    spark = df.sparkSession
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    seq = F.concat(
        F.lit(" "), F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")), F.lit(" ")
    )
    seqs = words.select(seq.alias("seq"), "freq")
    from ..catalog import materialize_shared

    seqs = materialize_shared(seqs)
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, rounds + 1):
        symbols = F.filter(F.split(F.col("seq"), " "), lambda t: t != F.lit(""))
        # sequence(0, -1) DESCENDS in Spark — single-symbol words need an
        # explicit empty pair list
        pair_structs = F.when(
            F.size(symbols) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(symbols) - 2),
                lambda i: F.struct(
                    symbols[i].alias("a"), symbols[i + 1].alias("b")
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        best = (
            seqs.select(F.explode(pair_structs).alias("p"), "freq")
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        merges.append((r, a, b, c))
        seqs = materialize_shared(
            seqs.select(
                F.replace(
                    F.col("seq"), F.lit(f" {a} {b} "), F.lit(f" {a}{b} ")
                ).alias("seq"),
                "freq",
            )
        )
    return merges
