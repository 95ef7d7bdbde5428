"""bigdataamazon_spark — a PySpark-native analytics engine.

Re-expresses the query/data-processing capabilities of the reference
pipeline (DucChinh0977/bigdataAmaZon, surveyed in SURVEY.md) as lazy,
distributed Spark DataFrame operators, generalized to the TPC-H-ish
testdata star schema plus documents/embeddings/events tables, and
extended with the LLM-data-pipeline surface (dedup, similarity search,
text analysis, multimodal plumbing).

Design rules (SURVEY.md §4, §7):
- DataFrame/SQL first; Catalyst does pushdown/pruning/join selection.
- No O(n^2) driver-side materialization: similarity is an edge table,
  top-k is a window, lookups are broadcast joins.
- Python UDFs only where no native expression exists, always
  Arrow-vectorized (pandas_udf / mapInPandas).
"""

__version__ = "0.1.0"
