"""Subquery surface: correlated scalar, uncorrelated scalar, IN, EXISTS —
the SQL spellings of the decorrelation machinery Catalyst provides for
free (SURVEY §4.2 'subquery decorrelation'). All run via spark.sql on the
fixture views; plans decorrelate into joins (no per-row re-execution)."""

from __future__ import annotations

from .base import F, tbl, views
from .registry import register


@register(
    "xh_correlated_scalar_subquery",
    oracle="""SELECT o.o_orderkey, o.o_custkey
              FROM orders o
              WHERE o.o_totalprice >
                    (SELECT CAST(SUM(CAST(FLOOR(o2.o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                                 / 100.0 / COUNT(*)
                     FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
              ORDER BY o.o_orderkey""",
    tags=("subquery",),
)
def h_correlated_scalar_subquery(spark, sf_dir):
    """Correlated scalar subquery: orders above their customer's average
    price (avg via the exact floor-cents integer sum -> fixed IEEE division
    sequence, so both engines compute the identical double). Catalyst decorrelates this into an
    aggregate + join — verified by it finishing in one pass."""
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey
        FROM orders o
        WHERE o.o_totalprice >
              (SELECT CAST(SUM(CAST(FLOOR(o2.o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                           / 100.0 / COUNT(*)
               FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o.o_orderkey
        """
    )


@register(
    "xh_scalar_and_in_subquery",
    oracle="""SELECT c_custkey, c_name
              FROM customer
              WHERE c_acctbal > (SELECT CAST(SUM(CAST(FLOOR(c2.c_acctbal * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                                             / 100.0 / COUNT(*)
                                 FROM customer c2)
                AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
              ORDER BY c_custkey""",
    tags=("subquery",),
)
def h_scalar_and_in_subquery(spark, sf_dir):
    """Uncorrelated scalar subquery (global average) + IN subquery in one
    predicate — the scalar becomes a broadcast value, the IN a semi join."""
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(FLOOR(c2.c_acctbal * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                                       / 100.0 / COUNT(*)
                           FROM customer c2)
          AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
        ORDER BY c_custkey
        """
    )


@register(
    "xh_exists_subquery_sql",
    oracle="""SELECT s_suppkey, s_name
              FROM supplier s
              WHERE EXISTS (SELECT 1 FROM lineitem l
                            WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49)
                AND NOT EXISTS (SELECT 1 FROM lineitem l2
                                WHERE l2.l_suppkey = s.s_suppkey AND l2.l_discount > 0.09)
              ORDER BY s_suppkey""",
    tags=("subquery",),
)
def h_exists_subquery_sql(spark, sf_dir):
    """EXISTS + NOT EXISTS in SQL form (decorrelated to semi + anti join)."""
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49)
          AND NOT EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_suppkey = s.s_suppkey AND l2.l_discount > 0.09)
        ORDER BY s_suppkey
        """
    )
