"""Bucketed co-located join (SCALE.md: 'pre-bucket both sides on the key
so the join is shuffle-free'). Writes lineitem and orders bucketed by the
order key via bucketBy/saveAsTable, then asserts the join plan contains NO
shuffle (Exchange) — the physical property that makes repeated fact-fact
joins affordable at 100 TB."""

import os

import pytest


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_oracle):
    # warehouse dir is a static conf — use the session default (./spark-warehouse)
    import shutil
    from urllib.parse import urlparse

    from hadoop_copier_spark.tables import load_table

    li = load_table(spark, sf_oracle, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_oracle, "orders").select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    # the in-memory catalog forgets tables across sessions but their
    # locations persist — clear them or saveAsTable fails LOCATION_ALREADY_EXISTS
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in ("li_bucketed", "o_bucketed"):
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("o_bucketed")
    )
    return "li_bucketed", "o_bucketed"


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    # at sf0.01 Catalyst would broadcast (and skip bucketing); disable the
    # broadcast threshold to exercise the big-big path this layout exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table(li_t)
        o = spark.table(o_t)
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: both sides read pre-bucketed files — no shuffle Exchange
        assert "Bucketed: true" in plan, plan[:800]
        assert "Exchange hashpartitioning" not in plan, plan[:800]
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, sf_oracle, bucketed_tables):
    from hadoop_copier_spark.tables import load_table

    li_t, o_t = bucketed_tables
    bucketed = (
        spark.table(li_t)
        .join(spark.table(o_t), spark.table(li_t).l_orderkey == spark.table(o_t).o_orderkey)
        .count()
    )
    li = load_table(spark, sf_oracle, "lineitem")
    o = load_table(spark, sf_oracle, "orders")
    plain = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert bucketed == plain
