"""Python UDTF surface (SURVEY §2.10) — the procedural fan-out seam.

Policy: native lateral ``explode``/``posexplode`` over builtin
expressions is always preferred (stays in whole-stage codegen); a
Python UDTF is the sanctioned escape hatch when the 1→N expansion is
genuinely *stateful per row* — a sequential scan whose emit decisions
depend on everything seen so far. Spark 4 Python UDTFs are that seam:
per-partition processes stream Arrow batches in, the class ``eval``
yields any number of rows per input, and the lateral join shape keeps
the expansion executor-side and partition-parallel (no shuffle, no
driver involvement).

Demonstrator: content-defined chunking (CDC), the rolling-hash
splitter rsync/LBFS-style dedup pipelines use — chunk boundaries are
cut where a hash of the trailing window hits a sentinel value, so
chunk edges realign after insertions (fixed-width chunking smears
every downstream chunk; that realignment is why chunk-level dedup of
near-identical documents works at all). The boundary decision at
position i needs the scanned window behind it — procedural, not a
per-position pure projection — which is exactly the UDTF use case.

The boundary rule here (codepoint sum of the trailing 4-gram mod 7)
is deliberately SQL-replayable so the DuckDB oracle can verify the
full fan-out value-for-value. Production CDC adds min/max chunk
clamps and a stronger rolling hash (Rabin fingerprint); both change
only ``eval``'s inner loop, not the plumbing.

Reference scope: the reference has no streaming-chunk analogue — this
generalizes its fixed tokenize/split text stages
(``/root/reference/amazon1.py:95-111``) to the stateful-splitter shape
a 100 TB curation pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

CDC_WINDOW = 4
CDC_MODULUS = 7


@udtf(returnType="doc_id bigint, chunk_idx int, chunk string")
class CDCChunkerUDTF:
    """Content-defined chunker: one (doc_id, text) row fans out to its
    chunk rows. Boundary after 1-based position i (i >= 4) when the
    codepoint sum of text[i-3..i] % 7 == 0; a final boundary always
    lands at len(text). Emitted chunks are non-empty and concatenate
    back to the input text."""

    def eval(self, doc_id: int, text: str):  # noqa: D102
        if not text:
            return
        n = len(text)
        w, m = CDC_WINDOW, CDC_MODULUS
        # rolling window sum: O(n) adds/subtracts, not O(n*w)
        cuts = []
        if n >= w:
            acc = sum(ord(c) for c in text[:w])
            if acc % m == 0:
                cuts.append(w)
            for i in range(w, n):
                acc += ord(text[i]) - ord(text[i - w])
                if acc % m == 0:
                    cuts.append(i + 1)
        if not cuts or cuts[-1] != n:
            cuts.append(n)
        prev = 0
        for idx, cut in enumerate(cuts, start=1):
            yield doc_id, idx, text[prev:cut]
            prev = cut


def cdc_chunks(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Lateral-join the CDC chunker over (doc_id, text).

    The UDTF registration is session-idempotent; the lateral form keeps
    correlation executor-side (each partition streams its own rows
    through its own Python worker — the plan is scan → BatchEvalPython
    fan-out, zero exchanges)."""
    spark.udtf.register("cdc_chunker_udtf", CDCChunkerUDTF)
    docs.select("doc_id", "text").createOrReplaceTempView("_cdc_docs_in")
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_idx, c.chunk
        FROM _cdc_docs_in d, LATERAL cdc_chunker_udtf(d.doc_id, d.text) c
        """
    )


class SplitFixedUDTF:
    """Polymorphic UDTF (Spark 4 ``analyze`` API): output schema is
    computed FROM THE ARGUMENTS — ``split_fixed(s, lit(n))`` emits n
    string columns ``c0..c{n-1}``. ``analyze`` runs at plan time on the
    driver with the literal argument values, so Catalyst sees a fully
    typed schema and downstream pruning/codegen work as for any static
    relation; ``eval`` then pads/truncates each row to exactly n
    fields. This is the schema-on-demand seam fixed-width extractors
    (CSV slicing, key=value fan-out) need — a static-schema UDTF would
    force array columns and lose pruning.
    """

    @staticmethod
    def analyze(s, n):
        from pyspark.sql.functions import AnalyzeResult  # noqa: PLC0415
        from pyspark.sql.types import StringType, StructType  # noqa: PLC0415

        if n.value is None or not isinstance(n.value, int) or n.value < 1:
            raise ValueError("split_fixed requires a positive integer literal n")
        schema = StructType()
        for i in range(n.value):
            schema = schema.add(f"c{i}", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, s: str, n: int):
        parts = (s or "").split(",")
        parts = (parts + [None] * n)[:n]
        yield tuple(parts)
