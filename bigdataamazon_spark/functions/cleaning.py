"""Scalar cleaning expressions (SURVEY.md §2.2, P3-P6, P10-P11, P15).

The reference applies these as row-at-a-time Python over pandas Series
(``/root/reference/amazon1.py:42-49,87-89,163-176``). Here each one
compiles to a Catalyst-native expression — regex/arith/string ops run
JVM-side inside whole-stage codegen, so they vectorize and push down.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_numeric(col: Column | str, *, allow_decimal: bool = True) -> Column:
    """Strip every non-digit (optionally keeping '.'), empty -> NULL, cast double.

    Mirrors ``clean_numeric_column`` at ``/root/reference/amazon1.py:42-49``:
    handles currency symbols, thousands separators and junk strings.
    """
    c = F.col(col) if isinstance(col, str) else col
    pattern = r"[^0-9.]" if allow_decimal else r"[^0-9]"
    stripped = F.regexp_replace(c.cast("string"), pattern, "")
    return F.nullif(stripped, F.lit("")).cast("double")


def clip(col: Column | str, lo: float, hi: float) -> Column:
    """Clamp to [lo, hi], null-preserving (``amazon1.py:89``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.least(F.greatest(c, F.lit(lo)), F.lit(hi))


def fill_then_clip(col: Column | str, fill: float, lo: float, hi: float) -> Column:
    """fillna THEN clip — the reference's exact order (``amazon1.py:89``)."""
    c = F.col(col) if isinstance(col, str) else col
    return clip(F.coalesce(c, F.lit(fill)), lo, hi)


def extract_between(col: Column | str, prefix_re: str, suffix_re: str) -> Column:
    """Substring between two delimiters via one regexp_extract
    (``shorten_image_url``, ``amazon1.py:163-169``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, f"{prefix_re}(.*?){suffix_re}", 1)


def strip_prefix(col: Column | str, prefix: str) -> Column:
    """Remove a literal prefix (``shorten_amazon_link``, ``amazon1.py:171-176``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.startswith(prefix), c.substr(F.lit(len(prefix) + 1), F.length(c))).otherwise(c)
