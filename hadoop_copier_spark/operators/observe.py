"""Job-piggybacked observability (round 7): `df.observe()` metrics.

A 100 TB pipeline cannot afford a second scan just to account for what
the first one did — row counts, sums, and null budgets for monitoring
must ride the SAME job as the transformation. Spark's Observation API
does exactly that: named aggregate expressions are evaluated inside the
existing plan (as an accumulator-backed CollectMetrics node, zero extra
exchange or scan) and become available on the driver after the action.

`observed_enriched_lineitem` wires the pattern: the returned frame is a
normal query result; the returned Observation yields the ingest metrics
(input rows after the filter, exact cents total, null count) once any
action runs — asserted against independently-computed values in
tests/test_quality_checks.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..queries.base import cents
from ..tables import load_table


def observed_enriched_lineitem(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, Observation]:
    """A representative transform (filtered lineitem rollup) with ingest
    metrics attached at the post-filter point: rows seen, exact cents
    sum, and the l_quantity null budget. The CollectMetrics node sits
    between the scan and the aggregate, so the metrics describe exactly
    what the transform consumed — no second scan, no extra shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation()
    observed = li.filter(F.col("l_discount") >= 0.02).observe(
        obs,
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(cents("l_extendedprice")).alias("sum_price_cents"),
        F.count(F.when(F.col("l_quantity").isNull(), 1)).alias("null_qty"),
    )
    out = (
        observed.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag")
    )
    return out, obs
