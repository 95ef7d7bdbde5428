"""Binary-file source: media ingestion into opaque binary columns.

The multimodal pipeline (``operators/multimodal.py``) works over
``(doc_id, blob binary)`` rows; this source is the ingest edge that
produces them from a directory tree of media files. Spark's built-in
``binaryFile`` format reads each file as one row — path, mtime,
length, and the full content as a binary column — with partition
parallelism across files and predicate pushdown on the path/length
metadata columns (the content column is only materialized for rows
that survive the pushed filters, so "skip files over 100 MB" never
reads the oversized bytes).

At 100 TB: many-small-files listing cost dominates before bytes do —
the same answer as every datalake: compact media into parquet with a
binary payload column once at the edge (``pack_to_parquet``) and run
everything downstream (decode, resize, frame-sample) off the parquet
copy, which is splittable, column-pruned, and co-locatable with its
metadata. The reference's media handling is URL string munging only
(``/root/reference/amazon1.py:163-174``); this is the generalized
ingest its image column implies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_dir(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Read a directory of files as (path, modificationTime, length,
    content) rows. ``glob`` filters file names (pushed to the listing);
    ``max_bytes`` is pushed as a length predicate so oversized payloads
    are never fetched."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df


def as_blob_table(files: DataFrame) -> DataFrame:
    """Normalize the binaryFile schema to the multimodal contract:
    (doc_id = dense hash of path, uri, n_bytes, blob)."""
    return files.select(
        F.xxhash64(F.col("path")).alias("doc_id"),
        F.col("path").alias("uri"),
        F.col("length").cast("int").alias("n_bytes"),
        F.col("content").alias("blob"),
    )


def pack_to_parquet(files: DataFrame, out_dir: str, *, target_file_mb: int = 512) -> None:
    """Compact a small-files media tree into splittable parquet blobs.

    One-time edge cost that converts N-files listing overhead into a
    scan-friendly table; sized by bytes (not file count) so row groups
    land near the target regardless of media size mix."""
    blobs = as_blob_table(files)
    total = blobs.agg(F.sum("n_bytes")).first()[0] or 0
    n_files = max(1, int(total / (target_file_mb * 1024 * 1024)) + 1)
    blobs.repartition(n_files).write.mode("overwrite").parquet(out_dir)
