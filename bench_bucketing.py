"""Bucketed-join amortization experiment (SCALE.md: 'pre-bucket both
sides on the key so repeated fact-fact joins are shuffle-free').

Writes a synthetic two-fact-table workload twice — plain parquet and
bucketBy(32, key) — then runs the same join N_JOINS times against each
layout with broadcast disabled. The bucketed layout pays its shuffle once
at WRITE time; every subsequent join reads pre-partitioned buckets and
skips both Exchanges. The plain layout re-shuffles both sides on every
join. At 100 TB the write-once/join-many trade is the difference between
a nightly pipeline that re-shuffles petabytes per query and one that
never shuffles the fact tables at all.

Run: python bench_bucketing.py   (env: SPARK_GRAFT_BUCKET_ROWS, default 2e6)
Prints one JSON line; results recorded in bench/bucketing_results.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from urllib.parse import urlparse

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from hadoop_copier_spark.session import get_spark  # noqa: E402

N_ROWS = int(float(os.environ.get("SPARK_GRAFT_BUCKET_ROWS", "2e6")))
N_JOINS = 5


def main() -> None:
    spark = get_spark(cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path

    fact_a = spark.range(N_ROWS).select(
        F.col("id").alias("key"), (F.col("id") % 97).alias("va")
    )
    fact_b = spark.range(N_ROWS).select(
        F.col("id").alias("key"), (F.col("id") % 89).alias("vb")
    )

    tables = {}
    for name, df, bucketed in (
        ("bb_a_plain", fact_a, False),
        ("bb_b_plain", fact_b, False),
        ("bb_a_bucketed", fact_a, True),
        ("bb_b_bucketed", fact_b, True),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
        w = df.write.mode("overwrite")
        if bucketed:
            w = w.bucketBy(32, "key").sortBy("key")
        t0 = time.time()
        w.saveAsTable(name)
        tables[name] = round(time.time() - t0, 3)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    def run_joins(a: str, b: str) -> tuple[float, bool]:
        ta, tb = spark.table(a), spark.table(b)
        joined = ta.join(tb, "key").select(F.sum(F.col("va") * F.col("vb")).alias("s"))
        t0 = time.time()
        for _ in range(N_JOINS):
            joined.collect()
        wall = time.time() - t0
        plan = (
            ta.join(tb, "key")._jdf.queryExecution().executedPlan().toString()
        )
        return round(wall, 3), "Exchange hashpartitioning" not in plan

    plain_wall, plain_nx = run_joins("bb_a_plain", "bb_b_plain")
    bucket_wall, bucket_nx = run_joins("bb_a_bucketed", "bb_b_bucketed")

    out = {
        "metric": "bucketed_join_amortization",
        "unit": "sec",
        "n_rows": N_ROWS,
        "n_joins": N_JOINS,
        "write_sec": tables,
        "plain": {"joins_wall_sec": plain_wall, "shuffle_free": plain_nx},
        "bucketed": {"joins_wall_sec": bucket_wall, "shuffle_free": bucket_nx},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
