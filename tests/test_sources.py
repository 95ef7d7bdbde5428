"""Sources/sinks: CSV ingest with the reference schema, the E1 cleaning
pipeline, and the parquet sink roundtrip (SURVEY.md §2.1-§2.2)."""

from __future__ import annotations

import csv
import os

from pyspark.sql import functions as F

from bigdataamazon_spark.sources import (
    PRODUCTS_SCHEMA,
    clean_products,
    read_products_csv,
    read_parquet,
    write_parquet,
)

_ROWS = [
    # name, main_category, sub_category, image, link, ratings, no_of_ratings, discount_price, actual_price
    (
        "Dell MS116 Wired Mouse",
        "electronics",
        "mice",
        "https://m.media-amazon.com/images/I/abc123._AC_UL320_.jpg",
        "https://www.amazon.in/Dell-MS116-Wired-Mouse/dp/B00ZZZ",
        "4.3",
        "1,23,456",
        "₹299",
        "₹599",
    ),
    (
        "OnePlus Nord CE 2 Lite 5G",
        "electronics",
        "phones",
        "https://m.media-amazon.com/images/I/def456._AC_UL320_.jpg",
        "https://www.amazon.in/OnePlus-Nord-CE-Lite/dp/B09YYYY",
        "4.4",
        "98,765",
        "₹18,999",
        "₹19,999",
    ),
    # junk ratings + empty price -> NULL after clean (P3)
    (
        "Mystery Gadget",
        "electronics",
        "misc",
        "https://m.media-amazon.com/images/I/zzz999._AC_UL320_.jpg",
        "https://www.amazon.in/Mystery/dp/B000001",
        "Get",
        "",
        "",
        "₹0",
    ),
    # null name -> dropped (P14)
    (
        None,
        "electronics",
        "misc",
        "img",
        "link",
        "3.0",
        "5",
        "₹1",
        "₹2",
    ),
]
# exact duplicate of row 0 -> dropped (D2)
_ROWS.append(_ROWS[0])


def _write_csv(path: str) -> None:
    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(PRODUCTS_SCHEMA.fieldNames())
        w.writerows(_ROWS)


def test_csv_roundtrip_and_clean(spark, tmp_path):
    p = os.path.join(tmp_path, "products.csv")
    _write_csv(p)
    raw = read_products_csv(spark, p)
    assert raw.schema == PRODUCTS_SCHEMA
    assert raw.count() == 5

    out = clean_products(raw)
    rows = {r["name"]: r for r in out.collect()}
    # dup + null-name rows dropped
    assert set(rows) == {"Dell MS116 Wired Mouse", "OnePlus Nord CE 2 Lite 5G", "Mystery Gadget"}

    dell = rows["Dell MS116 Wired Mouse"]
    assert dell["ratings_cleaned"] == 4.3
    assert dell["no_of_ratings_cleaned"] == 123456.0
    assert dell["discount_price_cleaned"] == 299.0
    assert dell["actual_price_cleaned"] == 599.0
    assert dell["discount_diff"] == 300.0
    assert abs(dell["discount_pct"] - 300.0 / 599.0 * 100.0) < 1e-9
    assert dell["image_id"] == "I/abc123"
    assert dell["link_id"] == "Dell-MS116-Wired-Mouse/dp/B00ZZZ"
    assert dell["search_terms"] == "dell ms116 wired mouse"

    myst = rows["Mystery Gadget"]
    assert myst["ratings_cleaned"] is None  # "Get" -> NULL
    assert myst["discount_price_cleaned"] is None  # "" -> NULL
    assert myst["actual_price_cleaned"] == 0.0
    # diff NULL -> pct NULL -> filled 0 -> clipped 0 (amazon1.py:89 order)
    assert myst["discount_pct"] == 0.0


def test_golden_lookups(spark, tmp_path):
    """The reference's two de-facto golden tests (``amazon1.py:205,269``):
    one exact-name probe (J1) and one partial-link contains probe (J3)."""
    p = os.path.join(tmp_path, "products.csv")
    _write_csv(p)
    out = clean_products(read_products_csv(spark, p))

    exact = out.filter(F.col("name") == "Dell MS116 Wired Mouse")
    assert exact.count() == 1

    partial = out.filter(F.col("link_id").contains("Nord-CE"))
    got = partial.select("name").collect()
    assert [r["name"] for r in got] == ["OnePlus Nord CE 2 Lite 5G"]


def test_parquet_sink_partitioned(spark, tmp_path):
    p = os.path.join(tmp_path, "products.csv")
    _write_csv(p)
    cleaned = clean_products(read_products_csv(spark, p))
    dest = os.path.join(tmp_path, "out_parquet")
    write_parquet(cleaned, dest, partition_by=["sub_category"], mode="overwrite")
    # hive-style partition dirs exist -> partition pruning is available
    subdirs = {d for d in os.listdir(dest) if d.startswith("sub_category=")}
    assert {"sub_category=mice", "sub_category=phones", "sub_category=misc"} <= subdirs

    back = read_parquet(spark, dest)
    assert back.count() == 3
    # partition filter prunes to one dir (plan shows PartitionFilters)
    plan = back.filter(F.col("sub_category") == "mice")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert back.filter(F.col("sub_category") == "mice").count() == 1


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    """JSONL sink/source: values survive the round trip under the
    explicit schema, and a malformed line lands in _corrupt_record
    instead of failing the scan (PERMISSIVE quarantine)."""
    from pyspark.sql import types as T

    from bigdataamazon_spark.sources import read_jsonl, write_jsonl

    docs = read_parquet(spark, "/root/testdata/sf0.001/documents.parquet")
    dest = os.path.join(tmp_path, "docs_jsonl")
    write_jsonl(docs, dest, mode="overwrite", compression=None)

    back = read_jsonl(spark, dest, docs.schema)
    assert back.count() == docs.count()
    want = {r["doc_id"] for r in docs.select("doc_id").collect()}
    got = {r["doc_id"] for r in back.select("doc_id").collect()}
    assert got == want

    # corrupt line -> quarantine column, not a job failure
    bad = os.path.join(tmp_path, "bad.jsonl")
    with open(bad, "w") as f:
        f.write('{"a": 1}\n')
        f.write("this is not json\n")
    schema = T.StructType([T.StructField("a", T.LongType())])
    q = read_jsonl(spark, bad, schema, keep_corrupt=True)
    rows = q.collect()
    assert len(rows) == 2
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(corrupt) == 1 and "not json" in corrupt[0]["_corrupt_record"]


def test_orc_roundtrip_pushdown(spark, tmp_path):
    """ORC sink/source: partitioned write prunes on read like parquet."""
    from bigdataamazon_spark.sources import read_orc, write_orc

    orders = read_parquet(spark, "/root/testdata/sf0.001/orders.parquet")
    dest = os.path.join(tmp_path, "orders_orc")
    write_orc(orders, dest, partition_by=["o_orderstatus"], mode="overwrite")

    back = read_orc(spark, dest)
    assert back.count() == orders.count()
    pruned = back.filter(F.col("o_orderstatus") == "F")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert pruned.count() == orders.filter(F.col("o_orderstatus") == "F").count()


def test_text_corpus_ids_stable(spark, tmp_path):
    """read_text_corpus: ids are content+provenance hashes — identical
    across re-reads and repartitionings, distinct across files for the
    same text."""
    from bigdataamazon_spark.sources import read_text_corpus

    d = os.path.join(tmp_path, "corpus")
    os.makedirs(d)
    for name, lines in [("a.txt", ["alpha", "beta"]), ("b.txt", ["alpha"])]:
        with open(os.path.join(d, name), "w") as f:
            f.write("\n".join(lines))

    c1 = read_text_corpus(spark, d)
    c2 = read_text_corpus(spark, d).repartition(4)
    ids1 = sorted(r["doc_id"] for r in c1.collect())
    ids2 = sorted(r["doc_id"] for r in c2.collect())
    assert ids1 == ids2 and len(ids1) == 3
    # same text in different files -> different ids (provenance in the mint)
    alphas = {r["doc_id"] for r in c1.filter(F.col("text") == "alpha").collect()}
    assert len(alphas) == 2

    whole = read_text_corpus(spark, d, whole_files=True)
    texts = sorted(r["text"] for r in whole.collect())
    assert texts == ["alpha", "alpha\nbeta"]


def test_compact_parquet_small_files(spark, tmp_path):
    from bigdataamazon_spark.sources.parquet import compact_parquet

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    frag = os.path.join(tmp_path, "fragmented")
    # force a small-file mess: many tiny files from one modest table
    li.repartition(40).write.option("maxRecordsPerFile", 500).parquet(frag)
    n_small = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    assert n_small >= 40

    out = os.path.join(tmp_path, "compacted")
    n = compact_parquet(
        spark, frag, out, target_file_bytes=2 * 1024 * 1024,
        sort_within_by=["l_shipdate"],
    )
    n_out = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_out == n < n_small
    # contents identical (multiset)
    a = spark.read.parquet(out)
    assert a.count() == li.count()
    assert a.exceptAll(li).count() == 0 and li.exceptAll(a).count() == 0
    # row-group clustering: every output file is internally sorted by
    # l_shipdate, so min/max zone maps prune date ranges
    import pyarrow.parquet as pq

    for f in os.listdir(out):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(out, f), columns=["l_shipdate"])
            vals = t.column("l_shipdate").to_pylist()
            assert vals == sorted(vals)


def test_html_report_sink(spark, tmp_path):
    from bigdataamazon_spark.sources.html import to_html_table, write_html_report

    df = spark.createDataFrame(
        [(1, "a <b> & 'c'"), (2, None)], "id long, name string"
    )
    t = to_html_table(df.orderBy("id"), max_rows=1)
    assert "<th>id</th><th>name</th>" in t
    assert "a &lt;b&gt; &amp; &#x27;c&#x27;" in t  # escaped
    assert "<td>2</td>" not in t  # max_rows respected
    out = os.path.join(tmp_path, "report.html")
    write_html_report(df.orderBy("id"), out, title="T & T")
    s = open(out).read()
    assert s.startswith("<!DOCTYPE html>") and "T &amp; T" in s and "<td></td>" in s


def test_zorder_compact_clusters_both_dims(spark, tmp_path):
    """Files written by zorder_compact must be clustered in EVERY
    z-ordered dimension: per-file value span << global span for both
    columns (a single-column sort clusters one dim; round-robin
    clusters none)."""
    import glob as _glob

    from bigdataamazon_spark.sources.parquet import zorder_compact

    src = str(tmp_path / "src")
    # coalesce(1): src byte size (→ output file count → z-range granularity)
    # must not depend on how many files prior session state splits this into
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").coalesce(1).write.parquet(src)
    dest = str(tmp_path / "zout")
    zorder_compact(spark, src, dest, ["l_extendedprice", "l_quantity"],
                   target_file_bytes=12 * 1024)

    files = _glob.glob(os.path.join(dest, "part-*.parquet"))
    assert len(files) >= 4
    glob_stats = spark.read.parquet(dest).agg(
        F.min("l_extendedprice"), F.max("l_extendedprice"),
        F.min("l_quantity"), F.max("l_quantity"),
    ).first()
    e_rng = glob_stats[1] - glob_stats[0]
    q_rng = glob_stats[3] - glob_stats[2]
    e_fracs, q_fracs = [], []
    for f in files:
        s = spark.read.parquet(f).agg(
            F.min("l_extendedprice"), F.max("l_extendedprice"),
            F.min("l_quantity"), F.max("l_quantity"),
        ).first()
        e_fracs.append((s[1] - s[0]) / e_rng)
        q_fracs.append((s[3] - s[2]) / q_rng)
    assert sum(e_fracs) / len(e_fracs) < 0.7
    assert sum(q_fracs) / len(q_fracs) < 0.7
    # rows conserved
    assert spark.read.parquet(dest).count() == spark.read.parquet(src).count()


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Long-lived lakes accumulate files written under different schema
    versions; mergeSchema reads must unify them (new column null-filled
    for old files) without rewriting history."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id bigint, v string").write.parquet(
        p + "/batch=1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, v string, score double"
    ).write.parquet(p + "/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "v", "score", "batch"}
    rows = {r.id: (r.v, r.score) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_binaryfile_ingest_and_pack(spark, tmp_path):
    """Media ingest edge: binaryFile rows -> blob contract -> parquet
    compaction, with the multimodal decode stage running off the packed
    copy (the 100 TB shape: bytes ride parquet, not a file listing)."""
    from bigdataamazon_spark.operators import multimodal
    from bigdataamazon_spark.sources import binaryfiles

    media = tmp_path / "media"
    media.mkdir()
    payloads = {f"img_{i}.bin": bytes([i] * 16 + list(range(16))) for i in range(5)}
    for name, data in payloads.items():
        (media / name).write_bytes(data)
    (media / "notes.txt").write_bytes(b"not media")

    files = binaryfiles.read_binary_dir(spark, str(media), glob="*.bin")
    assert files.count() == 5
    # length predicate is pushed to the source (skip-oversized without a fetch)
    capped = binaryfiles.read_binary_dir(spark, str(media), glob="*.bin", max_bytes=8)
    assert capped.count() == 0
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThanOrEqual(length" in plan

    blobs = binaryfiles.as_blob_table(files)
    rows = {r.uri.rsplit("/", 1)[-1]: r for r in blobs.collect()}
    assert rows["img_3.bin"].n_bytes == 32
    assert bytes(rows["img_3.bin"].blob) == payloads["img_3.bin"]
    # doc_ids are distinct (path-hash) and stable across re-reads
    assert blobs.select("doc_id").distinct().count() == 5

    out = tmp_path / "packed"
    binaryfiles.pack_to_parquet(files, str(out))
    packed = spark.read.parquet(str(out))
    assert packed.count() == 5
    # decode stage consumes the packed table unchanged
    feats = multimodal.decode_blobs(packed.select("doc_id", "blob"))
    assert feats.count() == 5
    assert feats.filter(F.col("n_bytes") != 32).count() == 0


def test_python_datasource_partitions_and_determinism(spark):
    from bigdataamazon_spark.sources import pysource

    pysource.register(spark)
    df = spark.read.format("synthetic_rows").option("n", 1000).option("parts", 4).load()
    assert df.rdd.getNumPartitions() == 4
    a = sorted((r["id"], r["v"]) for r in df.collect())
    b = sorted((r["id"], r["v"]) for r in df.collect())
    assert a == b and len(a) == 1000
    assert a[7][1] == pysource.row_value(7)


def test_python_datasource_filter_pushdown_matches_residual(spark):
    """The pushdown reader (bucket = k absorbed into the generator)
    returns exactly what Spark-side residual filtering returns."""
    from bigdataamazon_spark.sources import pysource

    pysource.register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        base = (
            spark.read.format("synthetic_rows").option("n", 2000).load()
            .filter("bucket = 3")
        )
        pushed = (
            spark.read.format("synthetic_rows_pushdown").option("n", 2000).load()
            .filter("bucket = 3")
        )
        assert sorted(map(tuple, pushed.collect())) == sorted(map(tuple, base.collect()))
        assert pushed.count() == 200
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")


def test_python_datasource_writer_commit_protocol(spark, tmp_path):
    """jsonl_dir writer: committed files match the manifest, no .tmp
    orphans survive, and a read-back returns the exact rows."""
    import json
    import os

    from bigdataamazon_spark.sources import pysource

    pysource.register(spark)
    out = str(tmp_path / "out")
    df = spark.range(100).selectExpr("id", "id % 7 AS g")
    df.repartition(4).write.format("jsonl_dir").option("path", out).mode(
        "append"
    ).save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST")))
    files = sorted(os.listdir(out))
    assert not [f for f in files if f.endswith(".tmp")]
    assert sorted(m["file"] for m in manifest["files"]) == [
        f for f in files if f != "_MANIFEST"
    ]
    assert sum(m["n_rows"] for m in manifest["files"]) == 100
    back = spark.read.json(os.path.join(out, "*.jsonl"))
    assert sorted((r["id"], r["g"]) for r in back.collect()) == [
        (i, i % 7) for i in range(100)
    ]


def test_vacuum_removes_only_unreferenced_files(spark, tmp_path):
    import os

    from bigdataamazon_spark.sources import pysource

    pysource.register(spark)
    out = str(tmp_path / "out")
    spark.range(10).write.format("jsonl_dir").option("path", out).mode("append").save()
    # simulate a crashed task's leftover and a stray file
    open(os.path.join(out, "part-dead.jsonl.tmp"), "w").write("{}")
    open(os.path.join(out, "stray.txt"), "w").write("x")
    removed = pysource.vacuum_jsonl_dir(out)
    assert removed == ["part-dead.jsonl.tmp", "stray.txt"]
    assert spark.read.json(os.path.join(out, "*.jsonl")).count() == 10
    assert pysource.vacuum_jsonl_dir(out) == []


def test_arrow_table_interchange_roundtrip(spark):
    """Spark 4 Arrow interchange: createDataFrame accepts a pyarrow
    Table and df.toArrow() returns one — the zero-serialization bridge
    to the Arrow ecosystem (DuckDB, Polars, Ray) that our oracle
    harness itself rides."""
    import pyarrow as pa

    t = pa.table(
        {
            "k": pa.array([1, 2, 3], type=pa.int64()),
            "v": pa.array(["a", "b", "c"]),
            "x": pa.array([1.5, 2.5, None], type=pa.float64()),
        }
    )
    df = spark.createDataFrame(t)
    assert df.schema.simpleString() == "struct<k:bigint,v:string,x:double>"
    back = df.orderBy("k").toArrow()
    assert back.column("k").to_pylist() == [1, 2, 3]
    assert back.column("x").to_pylist() == [1.5, 2.5, None]


def test_load_table_memoizes_handles_per_session_and_dir(spark, sf_dir):
    """The catalog's metadata cache: repeated load_table calls return
    the SAME immutable handle (no re-listing / footer re-read), keyed
    by (session, abspath(sf_dir), name) so distinct dirs and tables
    never cross-bind."""
    from bigdataamazon_spark.catalog import load_table

    a = load_table(spark, sf_dir, "orders")
    b = load_table(spark, sf_dir, "orders")
    assert a is b
    # a relative spelling of the same dir hits the same entry
    rel = os.path.relpath(sf_dir)
    assert load_table(spark, rel, "orders") is a
    # different table / different dir -> different handles
    assert load_table(spark, sf_dir, "lineitem") is not a
    # the memo must not change what the handle reads
    assert a.count() == spark.read.parquet(
        os.path.join(sf_dir, "orders.parquet")
    ).count()


def test_widen_partition_probe_is_memoized_and_semantics_free(spark, sf_dir):
    """widen()'s .rdd partition probe compiles a plan per call; the
    count is memoized per handle. The widened frame must contain the
    same rows and at least defaultParallelism partitions."""
    from bigdataamazon_spark.catalog import _NPARTS_CACHE, load_table, widen

    docs = load_table(spark, sf_dir, "documents")
    w1 = widen(docs)
    assert docs in _NPARTS_CACHE  # probe cached on the handle
    n_cached = _NPARTS_CACHE[docs]
    w2 = widen(docs)
    assert _NPARTS_CACHE[docs] == n_cached
    target = spark.sparkContext.defaultParallelism
    assert w1.rdd.getNumPartitions() >= min(target, docs.count())
    assert w1.count() == w2.count() == docs.count()


def test_invalidate_tables_drops_memoized_handles(spark, sf_dir):
    """load_table pins the first-load file listing (static-data
    assumption); invalidate_tables is the escape hatch for callers that
    regenerate a dataset mid-session."""
    from bigdataamazon_spark.catalog import _TABLE_HANDLES, invalidate_tables, load_table

    a = load_table(spark, sf_dir, "region")
    assert load_table(spark, sf_dir, "region") is a  # memoized handle
    n = invalidate_tables(spark, sf_dir)
    assert n >= 1
    b = load_table(spark, sf_dir, "region")
    assert b is not a  # re-listed after invalidation
    # other dirs untouched by a scoped invalidation
    load_table(spark, sf_dir, "nation")
    assert invalidate_tables(spark, "/nonexistent") == 0
    assert invalidate_tables(spark) >= 1  # global flush drops the rest
    assert not _TABLE_HANDLES.get(spark)
