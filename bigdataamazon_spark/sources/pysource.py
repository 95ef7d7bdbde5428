"""Spark 4 Python DataSource API surface (SURVEY §2.2 generalized).

The reference only ever reads CSV off disk (`amazon1.py:19`); a complete
engine also OWNS the extension seam users plug new sources into. This is
the Spark 4 Python DataSource API: schema declaration, partition
planning (one ``InputPartition`` per chunk → executors read chunks in
parallel, exactly how a real connector shards a remote store), and
filter pushdown (``pushFilters`` absorbs ``bucket = k`` equality so the
generator never materializes skipped rows — the Python-source analogue
of parquet PushedFilters).

The built-in source is deterministic: row i carries an md5-derived
uniform, so a registry entry over it is SQL-replayable (DuckDB walks
``range(n)`` through the same hash) and the driver hash-checks the
whole source path end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

HASH_SPACE = float(1 << 60)


def row_value(i: int) -> float:
    """Deterministic uniform for row i — first 60 bits of md5('pys:i')."""
    h = hashlib.md5(f"pys:{i}".encode()).hexdigest()
    return int(h[:15], 16) / HASH_SPACE


class _ChunkPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticRowsReader(DataSourceReader):
    """Base reader: no ``pushFilters`` so it runs under the default
    ``spark.sql.python.filterPushdown.enabled=false`` (the driver's
    session) — Spark applies residual filters itself."""

    def __init__(self, options):
        self.n = int(options.get("n", 10000))
        self.n_parts = int(options.get("parts", 8))
        self.bucket_eq: int | None = None

    def partitions(self):
        chunk = max(1, (self.n + self.n_parts - 1) // self.n_parts)
        return [
            _ChunkPartition(lo, min(lo + chunk, self.n))
            for lo in range(0, self.n, chunk)
        ]

    def read(self, partition: _ChunkPartition):
        for i in range(partition.start, partition.end):
            bucket = i % 10
            if self.bucket_eq is not None and bucket != self.bucket_eq:
                continue
            yield (i, bucket, row_value(i))


class PushdownSyntheticRowsReader(SyntheticRowsReader):
    """Pushdown-capable variant — requires
    ``spark.sql.python.filterPushdown.enabled=true`` (runtime conf;
    tests set it). Declaring ``pushFilters`` under the default conf is
    an error by API contract, hence the split class."""

    def pushFilters(self, filters: Sequence[Filter]) -> Iterator[Filter]:
        """Absorb `bucket = k`; everything else stays with Spark."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("bucket",):
                self.bucket_eq = int(f.value)
            else:
                yield f


class SyntheticRowsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_rows"

    def schema(self) -> str:
        return "id bigint, bucket int, v double"

    def reader(self, schema) -> SyntheticRowsReader:
        return SyntheticRowsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticStreamReader":
        return SyntheticStreamReader(self.options)


class PushdownSyntheticRowsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_rows_pushdown"

    def schema(self) -> str:
        return "id bigint, bucket int, v double"

    def reader(self, schema) -> PushdownSyntheticRowsReader:
        return PushdownSyntheticRowsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticRowsDataSource)
    spark.dataSource.register(PushdownSyntheticRowsDataSource)
    spark.dataSource.register(JsonlDirDataSource)


class SyntheticStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same deterministic generator: each
    batch advances the offset by ``batch_rows`` until ``max_rows``.
    ``readBetweenOffsets`` replays any committed range exactly — the
    recovery contract that makes the source exactly-once under
    checkpoint restart (offsets are plain dicts in the commit log)."""

    def __init__(self, options):
        self.batch_rows = int(options.get("batch_rows", 10))
        self.max_rows = int(options.get("max_rows", 100))

    def initialOffset(self):
        return {"pos": 0}

    def _rows(self, lo: int, hi: int):
        return [(i, i % 10, row_value(i)) for i in range(lo, hi)]

    def read(self, start):
        pos = int(start["pos"])
        end = min(pos + self.batch_rows, self.max_rows)
        return iter(self._rows(pos, end)), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return iter(self._rows(int(start["pos"]), int(end["pos"])))


class JsonlDirWriter(DataSourceWriter):
    """Python DataSource write path with the two-phase task-commit
    protocol: every task writes ``part-<uuid>.jsonl.tmp`` and returns
    the name in its commit message; the DRIVER's ``commit`` renames the
    winners and records them in ``_MANIFEST`` (atomic visibility —
    readers trust the manifest, half-written tmp files are invisible);
    ``abort`` deletes the orphans. This is the same rename-on-commit
    discipline as Hadoop FileOutputCommitter v1, expressed through the
    Spark 4 Python writer seam."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_dir writer requires option 'path'")
        self.overwrite = overwrite

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        tmp = os.path.join(self.path, name + ".tmp")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return JsonlCommit(name=name, n_rows=n)

    def commit(self, messages):
        import json
        import os

        files = []
        for m in messages:
            os.rename(
                os.path.join(self.path, m.name + ".tmp"),
                os.path.join(self.path, m.name),
            )
            files.append({"file": m.name, "n_rows": m.n_rows})
        with open(os.path.join(self.path, "_MANIFEST"), "w") as fh:
            json.dump({"files": files}, fh)

    def abort(self, messages):
        import os

        for m in messages:
            tmp = os.path.join(self.path, m.name + ".tmp")
            if os.path.exists(tmp):
                os.remove(tmp)


class JsonlCommit(WriterCommitMessage):
    def __init__(self, name: str, n_rows: int):
        self.name = name
        self.n_rows = n_rows


class JsonlDirDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def writer(self, schema, overwrite: bool) -> JsonlDirWriter:
        return JsonlDirWriter(self.options, overwrite)


def vacuum_jsonl_dir(path: str) -> list[str]:
    """Remove files not referenced by ``_MANIFEST`` (abandoned .tmp from
    crashed tasks, superseded parts) — the GC pass every manifest-based
    table format pairs with its commit protocol. Returns removed names.
    Never touches the manifest itself or files it references, so a
    concurrent reader trusting the manifest is unaffected."""
    import json
    import os

    manifest = os.path.join(path, "_MANIFEST")
    if not os.path.exists(manifest):
        return []
    with open(manifest) as fh:
        live = {m["file"] for m in json.load(fh)["files"]}
    removed = []
    for name in os.listdir(path):
        if name == "_MANIFEST" or name in live:
            continue
        os.remove(os.path.join(path, name))
        removed.append(name)
    return sorted(removed)
