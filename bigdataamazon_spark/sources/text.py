"""Raw-text corpus source (training-data ingest rung below JSONL).

Web-scale text pipelines start from files that are not records yet —
one document per file, or one document per line. Both shapes map to
``spark.read.text`` without any Python in the loop:

- line mode: one row per line, splittable within files;
- whole-file mode (``wholetext=True``): one row per file — the right
  shape when documents span lines; NOT splittable, so it relies on
  many small-ish files (the usual crawl-dump layout).

Row identity follows the repo rule (SURVEY.md §7 "hard parts"): minted
from content + provenance, never from row order, so ids survive
repartitioning and re-runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_corpus(
    spark: SparkSession,
    path: str,
    *,
    whole_files: bool = False,
) -> DataFrame:
    """(doc_id, source_file, text) from a text path/glob.

    doc_id is a 60-bit content+provenance hash (same mint as the dedup
    shingle ids — engine-independent, order-independent): md5 over
    source file and the line/file content, so a re-run or a repartition
    yields identical ids and exact-dedup downstream stays stable.
    """
    df = spark.read.text(path, wholetext=whole_files)
    src = F.input_file_name()
    sid = F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", src, F.col("value"))), 1, 15), 16, 10
    ).cast("bigint")
    return df.select(
        sid.alias("doc_id"),
        src.alias("source_file"),
        F.col("value").alias("text"),
    )
