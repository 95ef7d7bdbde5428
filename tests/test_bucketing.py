"""Co-located (bucketed) joins and salted skew joins (SURVEY.md §4 /
the 100 TB shuffle strategy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataamazon_spark.catalog import load_table
from bigdataamazon_spark.operators.relational import salted_join, write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Identically-bucketed tables joined on the bucket key must compile
    without a shuffle on either side."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_bkt", "l_orderkey", n_buckets=4, sort_col="l_orderkey")
    write_bucketed(o, "o_bkt", "o_orderkey", n_buckets=4, sort_col="o_orderkey")
    try:
        a = spark.table("li_bkt")
        b = spark.table("o_bkt")
        # disable broadcast so the co-location is what avoids the shuffle
        with_conf = spark.conf
        old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, a.l_orderkey == b.o_orderkey)
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            # sanity: result matches the plain join
            plain = li.join(o, li.l_orderkey == o.o_orderkey)
            assert joined.count() == plain.count()
        finally:
            with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS o_bkt")


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting must be invisible in the result: same rows as the plain
    equi-join, any salt_buckets."""
    ev = load_table(spark, sf_dir, "events")  # user_id is the skewable key
    users = (
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    )
    plain = ev.select("event_id", "user_id").join(users, "user_id")
    salted = salted_join(
        ev.select("event_id", "user_id"),
        users,
        "user_id",
        "user_id",
        salt_buckets=8,
    ).select("event_id", "user_id", "n_events")

    p = {(r.event_id, r.n_events) for r in plain.collect()}
    s = {(r.event_id, r.n_events) for r in salted.collect()}
    assert p == s
