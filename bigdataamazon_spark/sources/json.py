"""JSON-lines source/sink (S2 widened beyond the reference's one CSV).

Not present in the reference (single CSV input,
``/root/reference/amazon1.py:24-25``), but a first-class ingest format
for a training-data pipeline: crawl dumps and API exports arrive as
JSONL. Rules at scale:

- **Explicit schema, never inference.** ``spark.read.json`` without a
  schema runs a full extra pass over the data just to guess types, and
  type drift between files silently widens columns to string. The
  schema is a required argument here.
- **JSON-lines, not multiLine.** One object per line keeps the format
  splittable — a multiLine JSON array forces one task per file.
- **PERMISSIVE + _corrupt_record.** Malformed rows land in a quarantine
  column instead of failing the job; the caller decides whether to
  count, sample, or drop them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read JSON-lines path/glob with an explicit schema.

    ``keep_corrupt=True`` appends the PERMISSIVE-mode quarantine column
    (``_corrupt_record``) holding the raw text of rows that failed to
    parse; otherwise the scan schema omits it and bad rows surface as
    all-null records.
    """
    if keep_corrupt and CORRUPT_COL not in schema.fieldNames():
        schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
    return (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(schema)
        .json(path)
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "error",
    compression: str | None = "gzip",
) -> None:
    """Write df as JSON-lines (one object per line per task — no driver
    funnel). Compressed by default: JSONL is an interchange sink, and
    gzip-per-file keeps it splittable at the file level (one task per
    file on read-back)."""
    w = df.write.mode(mode)
    if compression is not None:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)
