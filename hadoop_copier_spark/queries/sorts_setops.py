"""Sorts / limits / top-k (Q41-Q43) and set operations (Q44-Q47).

Scale notes: Q42's global ORDER BY + LIMIT compiles to
TakeOrderedAndProject (per-partition top-k then driver merge of k rows —
no global sort shuffle); Q43's per-group top-k is a single window over one
hash shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import Window as W

from .base import F, cents, ocents, tbl
from .registry import register


@register(
    "q41",
    oracle="""SELECT o_orderkey, o_orderdate, o_totalprice
              FROM orders
              ORDER BY o_orderdate DESC NULLS LAST, o_orderkey""",
    tags=("sort",),
)
def q41(spark, sf_dir):
    """Multi-key sort with explicit NULLS LAST / asc-desc mix."""
    o = tbl(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_orderdate", "o_totalprice").orderBy(
        F.col("o_orderdate").desc_nulls_last(), F.col("o_orderkey").asc()
    )


@register(
    "q42",
    oracle=f"""SELECT l_orderkey, l_linenumber,
                     CAST({ocents('l_extendedprice')} * (100 - {ocents('l_discount')}) AS BIGINT) AS net_e4
              FROM lineitem
              ORDER BY net_e4 DESC, l_orderkey, l_linenumber
              LIMIT 100""",
    tags=("sort", "limit"),
)
def q42(spark, sf_dir):
    """Global top-100 after total order -> TakeOrderedAndProject (no full
    sort shuffle at any scale). Net price in exact BIGINT 1e-4 units
    (integer-units rule — the r3 DECIMAL form hash-failed on 59/100
    trailing-zero cells)."""
    li = tbl(spark, sf_dir, "lineitem")
    net_e4 = (cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))).alias("net_e4")
    return (
        li.select("l_orderkey", "l_linenumber", net_e4)
        .orderBy(F.col("net_e4").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


@register(
    "q43",
    oracle="""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders)
              WHERE rn <= 3
              ORDER BY o_custkey, rn""",
    tags=("sort", "topk"),
)
def q43(spark, sf_dir):
    """Top-3 orders per customer (window + filter; deterministic tiebreak)."""
    o = tbl(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@register(
    "q44",
    oracle="""SELECT custkey, src FROM (
                SELECT o_custkey AS custkey, 'o' AS src FROM orders
                UNION ALL
                SELECT c_custkey AS custkey, 'c' AS src FROM customer)
              ORDER BY custkey, src""",
    tags=("setop",),
)
def q44(spark, sf_dir):
    """UNION ALL (bag union — no shuffle, just partition concatenation)."""
    o = tbl(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"), F.lit("o").alias("src"))
    c = tbl(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"), F.lit("c").alias("src"))
    return o.unionAll(c).orderBy("custkey", "src")


@register(
    "q45",
    oracle="""SELECT o_custkey AS custkey FROM orders
              UNION
              SELECT c_custkey AS custkey FROM customer
              ORDER BY custkey""",
    tags=("setop",),
)
def q45(spark, sf_dir):
    """UNION (distinct) — union + hash-dedup on the key."""
    o = tbl(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = tbl(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    return o.union(c).distinct().orderBy("custkey")


@register(
    "q46",
    oracle="""SELECT c_custkey AS custkey FROM customer
              INTERSECT
              SELECT o_custkey AS custkey FROM orders
              ORDER BY custkey""",
    tags=("setop",),
)
def q46(spark, sf_dir):
    """INTERSECT (distinct customers that placed orders)."""
    c = tbl(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = tbl(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.intersect(o).orderBy("custkey")


@register(
    "q47",
    oracle="""SELECT c_custkey AS custkey FROM customer
              EXCEPT
              SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
              ORDER BY custkey""",
    tags=("setop",),
)
def q47(spark, sf_dir):
    """EXCEPT (customers with no urgent orders — the anti-join as a set op;
    the right side is filtered so the result is non-trivial at every sf)."""
    c = tbl(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = (
        tbl(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.subtract(o).orderBy("custkey")
