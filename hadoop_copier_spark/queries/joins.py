"""Join operators (SURVEY §2b Q12-Q23).

Scale notes per query are in the docstrings; the recurring ones:
- dimension tables (region/nation/part/supplier) are broadcast — no shuffle
  of the fact side on a 1000-executor cluster;
- fact-fact joins shuffle on the equi key; AQE splits skewed partitions;
- the non-equi joins (Q20/Q21) keep an equi component where possible so
  Catalyst avoids a pure broadcast-nested-loop over the big side.
"""

from __future__ import annotations

from .base import F, tbl
from .registry import register
from ..operators.asof import asof_join


@register(
    "q12",
    oracle="""SELECT c_custkey, c_name, n_name, r_name
              FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE c_mktsegment = 'BUILDING'
              ORDER BY c_custkey""",
    tags=("join",),
)
def q12(spark, sf_dir):
    """Multi-way inner equi-join; both dims broadcast (nation=25, region=5
    rows at any scale), so the customer scan never shuffles."""
    c = tbl(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
        .orderBy("c_custkey")
    )


@register(
    "q13",
    oracle="""SELECT l_orderkey, l_linenumber, p_name, p_brand
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_size < 15
              ORDER BY l_orderkey, l_linenumber""",
    tags=("join", "broadcast"),
)
def q13(spark, sf_dir):
    """Explicit broadcast hash join: part is the small dimension — the
    lineitem side streams through without shuffling."""
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part").filter(F.col("p_size") < 15)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "inner")
        .select("l_orderkey", "l_linenumber", "p_name", "p_brand")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "q14",
    oracle="""SELECT o_orderkey, l_linenumber,
                     (l_orderkey IS NOT NULL) AS has_item
              FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
              ORDER BY o_orderkey, l_linenumber NULLS FIRST""",
    tags=("join",),
)
def q14(spark, sf_dir):
    """Left outer join — orders without items survive with null right side
    (257 such orders at sf0.01)."""
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left")
        .select(
            "o_orderkey",
            "l_linenumber",
            F.col("l_orderkey").isNotNull().alias("has_item"),
        )
        .orderBy(F.col("o_orderkey"), F.col("l_linenumber").asc_nulls_first())
    )


@register(
    "q15",
    oracle="""SELECT o_orderkey, l_linenumber,
                     (l_orderkey IS NOT NULL) AS has_item
              FROM lineitem RIGHT JOIN orders ON l_orderkey = o_orderkey
              ORDER BY o_orderkey, l_linenumber NULLS FIRST""",
    tags=("join",),
)
def q15(spark, sf_dir):
    """Right outer join (mirror of Q14)."""
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "right")
        .select(
            "o_orderkey",
            "l_linenumber",
            F.col("l_orderkey").isNotNull().alias("has_item"),
        )
        .orderBy(F.col("o_orderkey"), F.col("l_linenumber").asc_nulls_first())
    )


@register(
    "q16",
    oracle="""SELECT c.c_custkey, o.o_orderkey
              FROM (SELECT * FROM customer WHERE c_acctbal > 9000) c
              FULL JOIN (SELECT * FROM orders WHERE o_totalprice < 5000) o
                ON c.c_custkey = o.o_custkey
              ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST""",
    tags=("join",),
)
def q16(spark, sf_dir):
    """Full outer join with disjoint filters — nulls appear on both sides."""
    c = tbl(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_totalprice") < 5000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "full")
        .select("c_custkey", "o_orderkey")
        .orderBy(F.col("c_custkey").asc_nulls_first(), F.col("o_orderkey").asc_nulls_first())
    )


@register(
    "q17",
    oracle="""SELECT c_custkey, c_name FROM customer
              WHERE EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
              ORDER BY c_custkey""",
    tags=("join", "semi"),
)
def q17(spark, sf_dir):
    """Left semi join (EXISTS): customers with at least one urgent order.
    Only the left side's columns flow — no row multiplication."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "q18",
    oracle="""SELECT c_custkey, c_name FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders
                                WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
              ORDER BY c_custkey""",
    tags=("join", "anti"),
)
def q18(spark, sf_dir):
    """Left anti join (NOT EXISTS): customers with no urgent order."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "q19",
    oracle="""SELECT r_name, n_name FROM region CROSS JOIN nation
              ORDER BY r_name, n_name""",
    tags=("join", "cross"),
)
def q19(spark, sf_dir):
    """Cross join (5 x 25 — cartesian of two broadcastable dims)."""
    r = tbl(spark, sf_dir, "region")
    n = tbl(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name").orderBy("r_name", "n_name")


@register(
    "q20",
    oracle="""SELECT s1.s_suppkey AS k1, s2.s_suppkey AS k2
              FROM supplier s1 JOIN supplier s2 ON s1.s_acctbal > s2.s_acctbal
              ORDER BY k1, k2""",
    tags=("join", "theta"),
)
def q20(spark, sf_dir):
    """Theta (non-equi) join — broadcast nested loop over the tiny supplier
    table; at scale a banded join (bucketize s_acctbal, equi-join on band,
    residual filter) replaces the BNLJ."""
    s1 = tbl(spark, sf_dir, "supplier").alias("s1")
    s2 = tbl(spark, sf_dir, "supplier").alias("s2")
    return (
        s1.join(F.broadcast(s2), F.col("s1.s_acctbal") > F.col("s2.s_acctbal"))
        .select(F.col("s1.s_suppkey").alias("k1"), F.col("s2.s_suppkey").alias("k2"))
        .orderBy("k1", "k2")
    )


@register(
    "q21",
    oracle="""SELECT e1.event_id AS id1, e2.event_id AS id2,
                     CAST(date_trunc('millisecond', e1.ts) AS TIMESTAMP) AS ts1,
                     CAST(date_trunc('millisecond', e2.ts) AS TIMESTAMP) AS ts2
              FROM events e1 JOIN events e2
                ON e1.user_id = e2.user_id
               AND date_trunc('millisecond', e2.ts)
                     BETWEEN date_trunc('millisecond', e1.ts)
                         AND date_trunc('millisecond', e1.ts) + INTERVAL 5 MINUTE
               AND e1.event_id <> e2.event_id
              ORDER BY id1, id2""",
    tags=("join", "range"),
)
def q21(spark, sf_dir):
    """Range/interval join: event pairs of the same user within 5 minutes.
    Keeps the user_id equi component so Catalyst plans a hash/SMJ join with
    a residual range filter — not a cartesian. ts compared at ms (rule 3)."""
    e = tbl(spark, sf_dir, "events").withColumn("ts_ms", F.date_trunc("millisecond", F.col("ts")))
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    cond = (
        (F.col("e1.user_id") == F.col("e2.user_id"))
        & F.col("e2.ts_ms").between(
            F.col("e1.ts_ms"), F.col("e1.ts_ms") + F.expr("INTERVAL 5 MINUTE")
        )
        & (F.col("e1.event_id") != F.col("e2.event_id"))
    )
    return (
        e1.join(e2, cond)
        .select(
            F.col("e1.event_id").alias("id1"),
            F.col("e2.event_id").alias("id2"),
            F.col("e1.ts_ms").alias("ts1"),
            F.col("e2.ts_ms").alias("ts2"),
        )
        .orderBy("id1", "id2")
    )


@register(
    "q22",
    oracle="""SELECT event_id, user_id, ts_ms, o_orderkey, o_orderdate FROM (
                SELECT e.event_id, e.user_id,
                       CAST(date_trunc('millisecond', e.ts) AS TIMESTAMP) AS ts_ms,
                       o.o_orderkey, o.o_orderdate,
                       row_number() OVER (PARTITION BY e.event_id
                                          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
                FROM events e JOIN orders o
                  ON e.user_id = o.o_custkey
                 AND o.o_orderdate <= CAST(date_trunc('millisecond', e.ts) AS TIMESTAMP)
              ) WHERE rn = 1
              ORDER BY event_id""",
    tags=("join", "asof"),
)
def q22(spark, sf_dir):
    """As-of join via the engine's asof_join operator: for each event, the
    user's most recent order at-or-before the event time (inclusive bound,
    deterministic o_orderkey tiebreak — DuckDB ASOF semantics made
    reproducible). Oracle is the equivalent window formulation."""
    e = (
        tbl(spark, sf_dir, "events")
        .withColumn("ts_ms", F.date_trunc("millisecond", F.col("ts")))
        .select("event_id", "user_id", "ts_ms")
    )
    o = tbl(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "user_id").select(
        "user_id", "o_orderkey", "o_orderdate"
    )
    return (
        asof_join(e, o, on="user_id", left_time="ts_ms", right_time="o_orderdate", tiebreak="o_orderkey")
        .select("event_id", "user_id", "ts_ms", "o_orderkey", "o_orderdate")
        .orderBy("event_id")
    )


@register(
    "xh_asof_bucketed",
    oracle="""SELECT event_id, user_id, ts_ms, o_orderkey, o_orderdate FROM (
                SELECT e.event_id, e.user_id,
                       CAST(date_trunc('millisecond', e.ts) AS TIMESTAMP) AS ts_ms,
                       o.o_orderkey, o.o_orderdate,
                       row_number() OVER (PARTITION BY e.event_id
                                          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
                FROM events e JOIN orders o
                  ON e.user_id = o.o_custkey
                 AND o.o_orderdate <= CAST(date_trunc('millisecond', e.ts) AS TIMESTAMP)
              ) WHERE rn = 1
              ORDER BY event_id""",
    tags=("join", "asof", "bucketed"),
)
def xh_asof_bucketed(spark, sf_dir):
    """q22's as-of join through the (key, time-bucket) equi pre-join path
    (asof_join lookback + bucket_width, VERDICT r8 #6) — registered as
    its own H query so the SCALE path, not just the plain form, is
    oracle-hash-gated. The 40-year lookback covers the fixture's entire
    orders history, so the oracle is EXACTLY q22's: bucketing is a pure
    plan transformation here (the bucket rides the join keys — pinned in
    tests/test_plans.py — and candidate fan-out per event is capped by
    the 2-bucket window instead of growing with history depth)."""
    e = (
        tbl(spark, sf_dir, "events")
        .withColumn("ts_ms", F.date_trunc("millisecond", F.col("ts")))
        .select("event_id", "user_id", "ts_ms")
    )
    o = tbl(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "user_id").select(
        "user_id", "o_orderkey", "o_orderdate"
    )
    return (
        asof_join(
            e, o, on="user_id", left_time="ts_ms", right_time="o_orderdate",
            tiebreak="o_orderkey",
            lookback=F.expr("INTERVAL '40' YEAR"),
            bucket_width=40 * 365.25 * 86400.0,
            # max realization of 40 calendar years: 14610 days (incl. 10
            # leap days) = 40 * 365.25 exactly
            lookback_seconds=40 * 365.25 * 86400.0,
        )
        .select("event_id", "user_id", "ts_ms", "o_orderkey", "o_orderdate")
        .orderBy("event_id")
    )


@register(
    "q23",
    oracle="""SELECT l1.l_orderkey AS okey,
                     l1.l_linenumber AS ln1, l2.l_linenumber AS ln2,
                     l1.l_quantity AS qty1, l2.l_quantity AS qty2
              FROM lineitem l1 JOIN lineitem l2
                ON l1.l_orderkey = l2.l_orderkey AND l1.l_linenumber < l2.l_linenumber
              ORDER BY okey, ln1, ln2""",
    tags=("join", "self"),
)
def q23(spark, sf_dir):
    """Self join: unordered lineitem pairs within an order (equi on the
    order key; the < predicate halves the pair count and dedups mirrors)."""
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    l1 = li.alias("l1")
    l2 = li.alias("l2")
    return (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_linenumber") < F.col("l2.l_linenumber")),
        )
        .select(
            F.col("l1.l_orderkey").alias("okey"),
            F.col("l1.l_linenumber").alias("ln1"),
            F.col("l2.l_linenumber").alias("ln2"),
            F.col("l1.l_quantity").alias("qty1"),
            F.col("l2.l_quantity").alias("qty2"),
        )
        .orderBy("okey", "ln1", "ln2")
    )


@register(
    "xh_theta_count",
    oracle="""SELECT s_suppkey,
                     CAST(rank() OVER (ORDER BY s_acctbal) - 1 AS BIGINT) AS n_smaller
              FROM supplier ORDER BY s_suppkey""",
    tags=("join", "theta", "scale-variant"),
)
def xh_theta_count(spark, sf_dir):
    """The theta join's AGGREGATE form at scale: for every supplier, how
    many suppliers have a strictly smaller account balance — i.e. q20's
    per-row match count, without materializing the O(n^2) pair set and
    without q20's nested-loop join.

    Banded plan (the strategy q20's docstring promises, realized):
    1. band = floor(acctbal / 500): any row in a LOWER band is strictly
       smaller (band_2 < band_1 implies acctbal_2 < band_1*500 <=
       acctbal_1), so cross-band matches collapse to per-band COUNTS —
       O(bands) metadata rows to the driver, prefix-summed to offsets;
    2. within a band, strictly-smaller counts come from RANK()-1 over a
       window PARTITIONED by band (ties share a rank, so rank-1 counts
       exactly the strictly-smaller rows) — parallel per band, never a
       global single-partition window (the q35 lesson);
    3. n_smaller = offset[band] + (rank_in_band - 1).
    The oracle spells the same quantity as a global RANK()-1 — tiny for
    DuckDB, while the Spark side keeps the shape that survives 10^9 rows.
    """
    from pyspark.sql import Window as W

    s = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    band = F.floor(F.col("s_acctbal") / F.lit(500.0)).cast("long")
    b = s.withColumn("band", band)
    counts = sorted(
        (r["band"], r["n"])
        for r in b.groupBy("band").agg(F.count(F.lit(1)).alias("n")).collect()
    )  # O(bands) metadata
    offsets, acc = {}, 0
    for bd, c in counts:
        offsets[bd] = acc
        acc += c
    off_expr = (
        F.element_at(
            F.create_map(*[F.lit(x) for pair in offsets.items() for x in pair]),
            F.col("band"),
        )
        if offsets
        else F.lit(0)
    )
    w = W.partitionBy("band").orderBy("s_acctbal")
    return (
        b.select(
            "s_suppkey",
            (off_expr + F.rank().over(w) - 1).cast("bigint").alias("n_smaller"),
        )
        .orderBy("s_suppkey")
    )
