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
    STEP2_RULES,
    STEP3_RULES,
    STEP4_SUFFIXES,
    by_length_desc,
)

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


def _rule_case(rules, min_m: int) -> str:
    """Longest-match CASE over (suffix, replacement) rules with an
    m(stem) > min_m gate — matching decides, the condition only gates."""
    whens = []
    for suf, rep in by_length_desc(rules):
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


def porter_ctes(src: str) -> tuple[str, str]:
    """CTE definitions stemming relation ``src(w0, n, w)`` -> final
    relation (w0, n, w); returns (cte_sql_fragment, final_name). The
    caller wraps with the length-<=-2 passthrough on w0 and re-groups.
    """
    m_eed = _m_stem(3)
    step1a = f"""
    t1a AS (
      SELECT w0, n, CASE
        WHEN right(w, 4) = 'sses' THEN {_cut(2)}
        WHEN right(w, 3) = 'ies' THEN {_cut(2)}
        WHEN right(w, 2) = 'ss' THEN w
        WHEN right(w, 1) = 's' THEN {_cut(1)}
        ELSE w END AS w
      FROM {src}
    )"""
    step1b = f"""
    p1b AS (SELECT w0, n, w, {_cv_expr('w')} AS cp FROM t1a),
    t1b AS (
      SELECT w0, n, CASE
        WHEN right(w, 3) = 'eed' THEN
          CASE WHEN {m_eed} > 0 THEN {_cut(1)} ELSE w END
        WHEN right(w, 2) = 'ed' AND {_has_vowel(2)} THEN {_cut(2)}
        WHEN right(w, 3) = 'ing' AND {_has_vowel(3)} THEN {_cut(3)}
        ELSE w END AS w,
      CASE
        WHEN right(w, 3) = 'eed' THEN FALSE
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
    step1c = f"""
    p1c AS (SELECT w0, n, w, {_cv_expr('w')} AS cp FROM t1bp),
    t1c AS (
      SELECT w0, n, CASE
        WHEN right(w, 1) = 'y' AND {_has_vowel(1)} THEN {_cut(1)} || 'i'
        ELSE w END AS w
      FROM p1c
    )"""
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


def porter_stem_sql(words_sql: str) -> str:
    """Full oracle: stem every word of ``words_sql`` (a query producing
    a single column ``word``) and return (stem, n) frequency rows —
    the DuckDB replay of Spark's groupBy(word) -> stem -> re-agg."""
    ctes, final = porter_ctes("src")
    return f"""
    WITH toks AS ({words_sql}),
    counts AS (SELECT word, count(*) AS n FROM toks GROUP BY word),
    src AS (SELECT word AS w0, n, word AS w FROM counts),
    {ctes}
    SELECT CASE WHEN length(w0) <= 2 THEN w0 ELSE w END AS stem,
           CAST(sum(n) AS BIGINT) AS n
    FROM {final}
    GROUP BY 1
    """
