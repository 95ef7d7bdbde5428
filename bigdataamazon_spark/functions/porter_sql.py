"""DuckDB-SQL emitter for the full original Porter stemmer.

Generates a CTE chain that replays, step for step, the pure-Python
implementation in ``operators/stemming.py`` — both sides consume the
SAME rule tables (``STEP2_RULES``/``STEP3_RULES``/``STEP4_SUFFIXES``)
and the same longest-match ordering helper, so the algorithm cannot
drift between the Spark query and its oracle. This is what lets the
driver value-hash a full (non-trivially-SQL) Porter ruleset: the
oracle is still one plain SELECT statement, just a generated one.

Emitter shape per step: a ``p*`` CTE computes the consonant/vowel
pattern ``cp`` of the current word once (classification of position i
depends only on positions <= i, so every stem candidate's pattern is a
prefix of ``cp``), then a ``t*`` CTE applies the step's CASE.

The y-resolution in the cv pattern ("y is a vowel iff preceded by a
consonant") is inherently sequential; the emitter unrolls a fixed
number of rewrite passes (each pass resolves at least the first y of
every unresolved y-run, so N passes cover any word whose longest y-run
is <= N). ``_CV_PASSES`` = 12 covers y-runs far beyond natural text;
parity with the exact Python classifier is pinned by tests over the
corpus vocabulary and hypothesis-generated words.
"""

from __future__ import annotations

from ..operators.stemming import (
    NLTK_POOL,
    NLTK_STEP2_RULES,
    STEP2_RULES,
    STEP3_RULES,
    STEP4_SUFFIXES,
    by_length_desc,
)

# SQL unroll depth for NLTK step 2's recursive '-alli' pre-rule: each
# application consumes 4 chars and re-enters step 2, so pass k handles
# words with k nested 'alli' suffixes ('...allialli'). 4 passes cover
# any word the tests (or natural text) can produce; the Python twin
# recurses unboundedly, so a >4-deep contrived word is the one place
# the two could differ — documented, not reachable by the fixtures.
_NLTK_ALLI_PASSES = 4

_CV_PASSES = 12


def _cv_expr(w: str) -> str:
    """cv pattern of string expression ``w``: vowels -> '1', everything
    else -> '0', then iteratively flip y-after-consonant to '1'.

    Markers are digits (not letters) so they can never collide with the
    word's own characters: literal digits are first translated to 'x'
    (they classify as consonants, same as in the Python classifier), so
    the only source of '1' in the pattern is a genuine vowel."""
    e = (
        f"regexp_replace(translate({w}, '0123456789aeiou',"
        f" 'xxxxxxxxxx11111'), '[^1y]', '0', 'g')"
    )
    for _ in range(_CV_PASSES):
        e = (
            f"regexp_replace(regexp_replace(regexp_replace({e}, '^y', '0'),"
            f" '0y', '01', 'g'), '1y', '10', 'g')"
        )
    return e


def _m_expr(cp: str) -> str:
    """Porter measure m of a cv-pattern expression: count of VC
    transitions in the run-collapsed pattern."""
    coll = f"regexp_replace(regexp_replace({cp}, '1+', 'V', 'g'), '0+', 'C', 'g')"
    return f"(length({coll}) - length(replace({coll}, 'VC', '#')))"


def _m_stem(cut: int) -> str:
    """m of the stem left after cutting ``cut`` suffix chars off w."""
    return _m_expr(f"substr(cp, 1, length(w) - {cut})")


def _has_vowel(cut: int) -> str:
    return f"substr(cp, 1, length(w) - {cut}) LIKE '%1%'"


_DOUBLE_C = (
    "(length(w) >= 2 AND substr(w, length(w) - 1, 1) = substr(w, length(w), 1)"
    " AND substr(cp, length(w), 1) = '0')"
)

# *o on the whole current word.
_CVC_FULL = (
    "(length(w) >= 3 AND substr(cp, length(w) - 2, 3) = '010'"
    " AND substr(w, length(w), 1) NOT IN ('w', 'x', 'y'))"
)

# *o on the stem w[:len(w)-1] (step 5a).
_CVC_MINUS1 = (
    "(length(w) >= 4 AND substr(cp, length(w) - 3, 3) = '010'"
    " AND substr(w, length(w) - 1, 1) NOT IN ('w', 'x', 'y'))"
)


def _cut(cut: int) -> str:
    return f"substr(w, 1, length(w) - {cut})"


def _rule_case(rules, min_m: int, *, ordered: bool = False) -> str:
    """CASE over (suffix, replacement) rules with an m(stem) > min_m
    gate — matching decides, the condition only gates. Longest-match
    order by default (the paper contract); ``ordered=True`` keeps the
    given list order (NLTK's first-match-in-list semantics)."""
    whens = []
    for suf, rep in rules if ordered else by_length_desc(rules):
        k = len(suf)
        out = _cut(k) + (f" || '{rep}'" if rep else "")
        whens.append(
            f"WHEN right(w, {k}) = '{suf}' THEN"
            f" CASE WHEN {_m_stem(k)} > {min_m} THEN {out} ELSE w END"
        )
    return "CASE " + " ".join(whens) + " ELSE w END"


def _step4_case() -> str:
    whens = []
    for suf in by_length_desc(STEP4_SUFFIXES):
        k = len(suf)
        cond = f"{_m_stem(k)} > 1"
        if suf == "ion":
            cond += (
                f" AND length(w) > {k}"
                f" AND substr(w, length(w) - {k}, 1) IN ('s', 't')"
            )
        whens.append(
            f"WHEN right(w, {k}) = '{suf}' THEN"
            f" CASE WHEN {cond} THEN {_cut(k)} ELSE w END"
        )
    return "CASE " + " ".join(whens) + " ELSE w END"


def porter_ctes(src: str, mode: str = "paper") -> tuple[str, str]:
    """CTE definitions stemming relation ``src(w0, n, w)`` -> final
    relation (w0, n, w); returns (cte_sql_fragment, final_name). The
    caller wraps with the length-<=-2 passthrough on w0 (and, for
    ``mode='nltk'``, the irregular-form pool) and re-groups.
    """
    if mode not in ("paper", "nltk"):
        raise ValueError(f"mode must be 'paper' or 'nltk', got {mode!r}")
    nltk = mode == "nltk"
    m_eed = _m_stem(3)
    ies4 = (
        f"WHEN right(w, 3) = 'ies' AND length(w) = 4 THEN {_cut(3)} || 'ie'\n        "
        if nltk
        else ""
    )
    step1a = f"""
    t1a AS (
      SELECT w0, n, CASE
        {ies4}WHEN right(w, 4) = 'sses' THEN {_cut(2)}
        WHEN right(w, 3) = 'ies' THEN {_cut(2)}
        WHEN right(w, 2) = 'ss' THEN w
        WHEN right(w, 1) = 's' THEN {_cut(1)}
        ELSE w END AS w
      FROM {src}
    )"""
    ied = (
        "WHEN right(w, 3) = 'ied' THEN CASE WHEN length(w) = 4"
        f" THEN {_cut(3)} || 'ie' ELSE {_cut(3)} || 'i' END\n        "
        if nltk
        else ""
    )
    ied_fired = "WHEN right(w, 3) = 'ied' THEN FALSE\n        " if nltk else ""
    step1b = f"""
    p1b AS (SELECT w0, n, w, {_cv_expr('w')} AS cp FROM t1a),
    t1b AS (
      SELECT w0, n, CASE
        {ied}WHEN right(w, 3) = 'eed' THEN
          CASE WHEN {m_eed} > 0 THEN {_cut(1)} ELSE w END
        WHEN right(w, 2) = 'ed' AND {_has_vowel(2)} THEN {_cut(2)}
        WHEN right(w, 3) = 'ing' AND {_has_vowel(3)} THEN {_cut(3)}
        ELSE w END AS w,
      CASE
        {ied_fired}WHEN right(w, 3) = 'eed' THEN FALSE
        WHEN right(w, 2) = 'ed' AND {_has_vowel(2)} THEN TRUE
        WHEN right(w, 3) = 'ing' AND {_has_vowel(3)} THEN TRUE
        ELSE FALSE END AS fired
      FROM p1b
    ),
    p1bp AS (SELECT w0, n, w, fired, {_cv_expr('w')} AS cp FROM t1b),
    t1bp AS (
      SELECT w0, n, CASE
        WHEN NOT fired THEN w
        WHEN right(w, 2) IN ('at', 'bl', 'iz') THEN w || 'e'
        WHEN {_DOUBLE_C} AND substr(w, length(w), 1) NOT IN ('l', 's', 'z')
          THEN {_cut(1)}
        WHEN {_m_expr('cp')} = 1 AND {_CVC_FULL} THEN w || 'e'
        ELSE w END AS w
      FROM p1bp
    )"""
    y_cond = (
        # NLTK ext: consonant immediately before the final y, stem > 1
        "length(w) > 2 AND substr(cp, length(w) - 1, 1) = '0'"
        if nltk
        else _has_vowel(1)
    )
    step1c = f"""
    p1c AS (SELECT w0, n, w, {_cv_expr('w')} AS cp FROM t1bp),
    t1c AS (
      SELECT w0, n, CASE
        WHEN right(w, 1) = 'y' AND {y_cond} THEN {_cut(1)} || 'i'
        ELSE w END AS w
      FROM p1c
    )"""
    if nltk:
        # unrolled recursive '-alli' pre-rule, then NLTK-ordered list
        alli = ""
        prev = "t1c"
        for i in range(_NLTK_ALLI_PASSES):
            alli += f"""
    pa{i} AS (SELECT w0, n, w, {_cv_expr('w')} AS cp FROM {prev}),
    ta{i} AS (
      SELECT w0, n, CASE
        WHEN right(w, 4) = 'alli' AND {_m_stem(4)} > 0 THEN {_cut(4)} || 'al'
        ELSE w END AS w
      FROM pa{i}
    ),"""
            prev = f"ta{i}"
        step2 = f"""{alli}
    p2 AS (SELECT w0, n, w, {_cv_expr('w')} AS cp FROM {prev}),
    t2 AS (SELECT w0, n,
           {_rule_case(NLTK_STEP2_RULES, 0, ordered=True)} AS w FROM p2)"""
    else:
        step2 = f"""
    p2 AS (SELECT w0, n, w, {_cv_expr('w')} AS cp FROM t1c),
    t2 AS (SELECT w0, n, {_rule_case(STEP2_RULES, 0)} AS w FROM p2)"""
    step3 = f"""
    p3 AS (SELECT w0, n, w, {_cv_expr('w')} AS cp FROM t2),
    t3 AS (SELECT w0, n, {_rule_case(STEP3_RULES, 0)} AS w FROM p3)"""
    step4 = f"""
    p4 AS (SELECT w0, n, w, {_cv_expr('w')} AS cp FROM t3),
    t4 AS (SELECT w0, n, {_step4_case()} AS w FROM p4)"""
    m5a = _m_stem(1)
    step5 = f"""
    p5a AS (SELECT w0, n, w, {_cv_expr('w')} AS cp FROM t4),
    t5a AS (
      SELECT w0, n, CASE
        WHEN right(w, 1) = 'e' AND ({m5a} > 1 OR ({m5a} = 1 AND NOT {_CVC_MINUS1}))
          THEN {_cut(1)}
        ELSE w END AS w
      FROM p5a
    ),
    p5b AS (SELECT w0, n, w, {_cv_expr('w')} AS cp FROM t5a),
    t5b AS (
      SELECT w0, n, CASE
        WHEN {_m_expr('cp')} > 1 AND {_DOUBLE_C} AND right(w, 1) = 'l'
          THEN {_cut(1)}
        ELSE w END AS w
      FROM p5b
    )"""
    ctes = ",".join([step1a, step1b, step1c, step2, step3, step4, step5])
    return ctes, "t5b"


def pool_case_sql(word_expr: str, else_expr: str) -> str:
    """CASE mapping NLTK's irregular-form pool, else ``else_expr``."""
    whens = " ".join(
        f"WHEN {word_expr} = '{k}' THEN '{v}'" for k, v in sorted(NLTK_POOL.items())
    )
    return f"CASE {whens} ELSE {else_expr} END"


def porter_stem_sql(words_sql: str, mode: str = "paper") -> str:
    """Full oracle: stem every word of ``words_sql`` (a query producing
    a single column ``word``) and return (stem, n) frequency rows —
    the DuckDB replay of Spark's groupBy(word) -> stem -> re-agg."""
    ctes, final = porter_ctes("src", mode)
    stem_expr = "CASE WHEN length(w0) <= 2 THEN w0 ELSE w END"
    if mode == "nltk":
        stem_expr = pool_case_sql("w0", stem_expr)
    return f"""
    WITH toks AS ({words_sql}),
    counts AS (SELECT word, count(*) AS n FROM toks GROUP BY word),
    src AS (SELECT word AS w0, n, word AS w FROM counts),
    {ctes}
    SELECT {stem_expr} AS stem,
           CAST(sum(n) AS BIGINT) AS n
    FROM {final}
    GROUP BY 1
    """
