"""Skew-join experiment (SCALE.md: "skewed keys -> salting or AQE skew
split"): measure, don't guess.

Builds a synthetic hot-key fact table (50% of rows share one key — the
shape AQE's skew threshold and salting exist for), joins it to a small
dim three ways, and records wall time + max task input rows per strategy:

  plain      — hash join, AQE skew split DISABLED (the naive baseline;
               one reducer owns the hot key)
  aqe        — hash join with AQE skewJoin enabled (runtime split)
  salted     — operators/skew.salted_join (explicit n-way key split;
               works even where AQE can't see the skew, e.g. bucketed
               inputs or non-shuffle joins)

Run: python bench_skew.py   (env: SPARK_GRAFT_SKEW_ROWS, default 4e6)
Prints one JSON line; results recorded in bench/skew_results.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from hadoop_copier_spark.operators.skew import salted_join  # noqa: E402
from hadoop_copier_spark.session import get_spark  # noqa: E402

N_ROWS = int(float(os.environ.get("SPARK_GRAFT_SKEW_ROWS", "4e6")))
N_KEYS = 1000  # cold keys; key 0 is hot


def build_tables(spark):
    """Fact: N rows, half on key 0, half uniform over 1..N_KEYS.
    Dim: one row per key."""
    fact = (
        spark.range(N_ROWS)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise((F.pmod(F.xxhash64("id"), F.lit(N_KEYS - 1)) + 1))
            .cast("long")
            .alias("key"),
            F.col("id").alias("payload"),
        )
        .localCheckpoint(eager=True)  # freeze input so each strategy reads the same bytes
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("key"), F.concat(F.lit("k"), F.col("id")).alias("name")
    )
    return fact, dim


def run(spark, fact, dim, strategy: str) -> dict:
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.enabled", "true" if strategy == "aqe" else "false"
    )
    # force a shuffle join: the dim is tiny, so broadcast would hide the
    # skew entirely (and at 100 TB the dim side often isn't broadcastable)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        if strategy == "salted":
            joined = salted_join(fact, dim, "key", n_salts=32, salt_source="payload")
        else:
            joined = fact.join(dim, "key")
        t0 = time.time()
        n = joined.count()
        wall = time.time() - t0
        return {"strategy": strategy, "wall_sec": round(wall, 3), "rows": n}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")


def main() -> None:
    spark = get_spark(cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    fact, dim = build_tables(spark)
    fact.count()  # warm
    results = [run(spark, fact, dim, s) for s in ("plain", "aqe", "salted")]
    out = {
        "metric": "skew_join_hot_key_50pct",
        "unit": "sec",
        "n_rows": N_ROWS,
        "results": results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
