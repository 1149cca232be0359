"""Aggregation operators (SURVEY §2b Q24-Q33 + T/P extras).

Reference parity: the reference's only aggregations are filter+count over
item status (CopyTaskService.java:109-114), sum/boolean-AND over copy
results (HdfsCopyService.java:74-76,97-101) and the conditional rollup
(CopyTaskService.java:116-122); the relational aggregation surface here is
the north-star extension, executed by Spark's partial+final hash aggregate
(map-side combine — no raw-row shuffle).
"""

from __future__ import annotations

from .base import F, dec, dec_avg, money_sum, tbl, views
from .registry import register

_Q24_ORACLE = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_base,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(38,4)) AS sum_disc_price,
  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))
           * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DECIMAL(38,6)) AS sum_charge,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS DECIMAL(18,6)) AS avg_qty,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q24", oracle=_Q24_ORACLE, tags=("agg", "flagship"))
def q24(spark, sf_dir):
    """Hash aggregate, TPC-H Q1 analog: scan -> filter -> groupBy -> decimal
    sums/avg/count -> order. Partial aggregation happens map-side; only the
    (3 x 2)-key aggregate state shuffles, so this scales to any row count."""
    li = tbl(spark, sf_dir, "lineitem")
    # All arithmetic in the decimal domain (raw 2-dp columns cast first):
    # exact and order-independent in both engines (SURVEY §2b rule 2).
    disc_price = dec("l_extendedprice", 12, 2) * (1 - dec("l_discount", 12, 2))
    charge = disc_price.cast("decimal(18,4)") * (1 + dec("l_tax", 12, 2))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity", 12, 2)).cast("decimal(38,2)").alias("sum_qty"),
            F.sum(dec("l_extendedprice", 12, 2)).cast("decimal(38,2)").alias("sum_base"),
            F.sum(disc_price).cast("decimal(38,4)").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(38,6)").alias("sum_charge"),
            dec_avg("l_quantity", "avg_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
