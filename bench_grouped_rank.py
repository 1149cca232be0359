"""Measured trade-off for the round-12 grouped_rank skew primitive:
exact per-group ranks on a 90%-skewed key via (a) the naive
ROW_NUMBER() window (the skewed group sorts in ONE task) vs (b)
operators/prefix.grouped_rank (range-partition + per-(pid, group)
offset fix-up — the skewed group SPANS partitions).

Both plans produce identical ranks (property-tested in
tests/test_properties.py). The probe records BOTH dimensions of the
trade HONESTLY:

* wall seconds — at 40M rows the naive single-task sort WINS on wall
  (a JVM in-memory sort of 36M rows is cheap; grouped_rank pays one
  full materialization to pin range boundaries plus an extra join).
* max rows any one task must hold — the dimension that decides 100 TB
  feasibility: the naive window puts the ENTIRE hot group (90% of the
  corpus) in one task, which is a guaranteed OOM long before 100 TB,
  while grouped_rank's per-task load is corpus/partitions regardless
  of skew. The crossover is wherever the hot group stops fitting one
  executor; below it, use the window (xh_stratified_split's fixture
  sizes sit below it, but its 100 TB contract does not).

Writes bench/grouped_rank_results.json cited by SCALE.md.

Run: python bench_grouped_rank.py
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hadoop_copier_spark.operators.prefix import grouped_rank  # noqa: E402
from hadoop_copier_spark.session import get_spark  # noqa: E402

N = 40_000_000
HOT_FRAC = 0.9


def main() -> None:
    spark = get_spark(cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_hot = int(N * HOT_FRAC)
    df = (
        spark.range(N)
        .select(
            F.when(F.col("id") < n_hot, F.lit("hot"))
            .otherwise(F.concat(F.lit("s"), (F.col("id") % 64).cast("string")))
            .alias("g"),
            F.xxhash64(F.col("id").cast("string")).alias("v"),
            F.col("id"),
        )
        .repartition(32)
        .localCheckpoint(eager=True)  # both contenders start from RAM
    )

    t0 = time.time()
    w = W.partitionBy("g").orderBy("v", "id")
    naive = df.withColumn("rk", F.row_number().over(w))
    naive_cnt = naive.filter(F.col("rk") == 1).count()
    naive_sec = round(time.time() - t0, 3)

    t0 = time.time()
    fixed = grouped_rank(df, ["g"], ["v", "id"])
    fixed_cnt = fixed.filter(F.col("rk") == 1).count()
    fixed_sec = round(time.time() - t0, 3)

    assert naive_cnt == fixed_cnt  # same number of groups ranked

    # boundedness: rows the heaviest single task must sort/hold
    ranged_max = (
        df.repartitionByRange(32, "g", "v", "id")
        .withColumn("__p", F.spark_partition_id())
        .groupBy("__p")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )

    out = {
        "metric": "grouped_rank_skew_probe",
        "unit": "sec",
        "n_rows": N,
        "hot_fraction": HOT_FRAC,
        "n_groups": int(naive_cnt),
        "naive_window_sec": naive_sec,
        "grouped_rank_sec": fixed_sec,
        "wall_ratio_naive_over_ranged": round(
            naive_sec / max(fixed_sec, 1e-9), 2
        ),
        "naive_max_task_rows": n_hot,
        "grouped_rank_max_task_rows": int(ranged_max),
        "loadavg_1m_5m_15m": [round(x, 2) for x in os.getloadavg()],
    }
    os.makedirs(os.path.join(_REPO, "bench"), exist_ok=True)
    with open(os.path.join(_REPO, "bench", "grouped_rank_results.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
