"""Scalable global running (prefix) sum over a total order.

A naive ``SUM(v) OVER (ORDER BY ...)`` plans an empty-PARTITION-BY window:
every row funnels into ONE sorted partition — the same scale-killer shape
q35's ntile had before round 5 (see queries/windows.py). This operator
produces the identical running sum with no single-partition anything,
using the range-partitioned fix-up pattern:

1. range-repartition on the total order + in-partition sort — each of the
   P partitions owns a contiguous key range;
2. stamp (partition_id, local_index) JVM-side via
   ``monotonically_increasing_id`` (documented layout: partition id in the
   upper bits, a consecutive counter in the lower 33). localCheckpoint
   pins the sampled range boundaries so both downstream jobs see the SAME
   partitioning;
3. per-partition value sums (<= P rows — driver metadata, not data) ->
   cumulative offsets per partition;
4. running sum = offset[pid] + in-partition prefix sum, where the prefix
   sum is a window PARTITIONED BY pid — P bounded groups, each sorted
   locally, never a global funnel.

At 100 TB this is two parallel exchanges plus an O(P) driver aggregate;
the equivalent single-partition window is one machine sorting the world.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_prefix_sum"]


def global_prefix_sum(
    df: DataFrame,
    value_col: str | Column,
    order_cols: list,
    out_col: str = "cum",
) -> DataFrame:
    """``df`` + a BIGINT ``out_col`` = running sum of ``value_col`` in the
    total order given by ``order_cols`` (must be a TOTAL order — include a
    unique tiebreak column, or ties make the result partition-dependent).
    Row order of the output is unspecified (sort downstream as needed)."""
    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    base = df.withColumn("__psv", v.cast("long"))
    parted = base.repartitionByRange(n_parts, *order_cols).sortWithinPartitions(
        *order_cols
    )
    idx = (
        parted.withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.shiftright(F.col("__mid"), 33).cast("int"))
        .withColumn("__lidx", F.col("__mid") % F.lit(1 << 33))
        .drop("__mid")
        .localCheckpoint()  # pin the sampled range boundaries across jobs
    )
    psums = sorted(
        (r["__pid"], r["s"] or 0)
        for r in idx.groupBy("__pid").agg(F.sum("__psv").alias("s")).collect()
    )  # <= n_parts rows: metadata, not data
    offsets, acc = {}, 0
    for pid, s in psums:
        offsets[pid] = acc
        acc += s
    if offsets:
        off = F.element_at(
            F.create_map(*[F.lit(x) for po in offsets.items() for x in po]),
            F.col("__pid"),
        )
    else:  # empty input: no partitions ever materialized
        off = F.lit(0)
    w = (
        Window.partitionBy("__pid")
        .orderBy("__lidx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (F.sum("__psv").over(w) + off).cast("long").alias(out_col)
    return idx.select(*df.columns, cum)
