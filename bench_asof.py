"""As-of join history-depth scaling probe: does the (key, time-bucket)
equi pre-join (operators/asof.py bucket_width, round 10) actually cap
candidate fan-out as history accumulates?

The fixtures cannot show this — sf0.1 carries one ~7-year order history
per customer. This probe manufactures depth: the orders table is grown
x1 / x8 / x32 by appending replicas of the whole history shifted 45
years into the past (fresh o_orderkeys). Because every replica is
strictly older than every original, the as-of ANSWER is identical at
every factor — the replicas are pure candidate noise, exactly what deep
history is to an as-of join:

  plain    — asof_join with no lookback (q22's shape): every historical
             order at-or-before each event is a candidate row into the
             max_by aggregation, so candidate volume grows with depth.
  bucketed — asof_join with lookback = 40 YEARS + bucket_width = 40y:
             the 45-year-old replicas fail the bucket equi key at the
             JOIN, so candidate volume stays at the x1 level no matter
             the depth.
  narrow   — round 11: same lookback but bucket_width = 10y (the
             multi-bucket explode path: ceil(40/10)+1 = 5 left copies).
             Finer buckets prune candidates harder at the join but pay
             5x left-side fan-out — the tradeoff the width knob controls.

Result equality to the x1 answer is asserted for both plans at every
factor. Prints one JSON line and records bench/asof_results.json — the
measured backing for SCALE.md's "bucketed as-of caps per-key fan-out at
100x history depth" row.

Run: python bench_asof.py   (env: SPARK_GRAFT_ASOF_BASE, default
/root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from hadoop_copier_spark.operators.asof import asof_join  # noqa: E402
from hadoop_copier_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_ASOF_BASE", "/root/testdata/sf0.1")
FACTORS = (1, 8, 32)
LOOKBACK_YEARS = 40
SHIFT_YEARS = 45  # replica age: outside the lookback, older than any original
W_SECONDS = LOOKBACK_YEARS * 365.25 * 86400.0


def build_history(spark, out_dir: str, factor: int) -> str:
    o = spark.read.parquet(os.path.join(BASE, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    n_keys = o.agg(F.max("o_orderkey")).collect()[0][0] + 1
    reps = [o]
    for i in range(1, factor):
        reps.append(
            o.select(
                (F.col("o_orderkey") + F.lit(i * n_keys)).alias("o_orderkey"),
                "o_custkey",
                (
                    F.col("o_orderdate") - F.expr(f"INTERVAL '{SHIFT_YEARS}' YEAR")
                ).alias("o_orderdate"),
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    path = os.path.join(out_dir, f"x{factor}")
    out.write.mode("overwrite").parquet(path)
    return path


def events_frame(spark):
    from hadoop_copier_spark.tables import load_table

    return (
        load_table(spark, BASE, "events")
        .withColumn("ts_ms", F.date_trunc("millisecond", F.col("ts")))
        .select("event_id", "user_id", "ts_ms")
    )


def run_asof(spark, orders_path: str, bucketed: bool, width: float = None):
    e = events_frame(spark)
    o = (
        spark.read.parquet(orders_path)
        .withColumnRenamed("o_custkey", "user_id")
        .select("user_id", "o_orderkey", "o_orderdate")
    )
    kwargs = {}
    if bucketed:
        kwargs = dict(
            lookback=F.expr(f"INTERVAL '{LOOKBACK_YEARS}' YEAR"),
            bucket_width=width if width is not None else W_SECONDS,
            lookback_seconds=W_SECONDS,
        )
    return (
        asof_join(
            e, o, on="user_id", left_time="ts_ms", right_time="o_orderdate",
            tiebreak="o_orderkey", **kwargs
        )
        .select("event_id", "o_orderkey")
        .orderBy("event_id")
    )


def timed_rows(df):
    t0 = time.monotonic()
    rows = [tuple(r) for r in df.collect()]
    return round(time.monotonic() - t0, 3), rows


def main() -> None:
    spark = get_spark()
    tmp = tempfile.mkdtemp(prefix="asof_bench_")
    results = {}
    try:
        base_rows = None
        for factor in FACTORS:
            path = build_history(spark, tmp, factor)
            n_orders = spark.read.parquet(path).count()
            plain_s, plain_rows = timed_rows(run_asof(spark, path, bucketed=False))
            buck_s, buck_rows = timed_rows(run_asof(spark, path, bucketed=True))
            narrow_s, narrow_rows = timed_rows(
                run_asof(spark, path, bucketed=True, width=W_SECONDS / 4)
            )
            if base_rows is None:
                base_rows = plain_rows
            # replicas are strictly older than every original, so depth
            # must never change the answer on any plan
            assert plain_rows == base_rows, f"x{factor}: plain answer drifted"
            assert buck_rows == base_rows, f"x{factor}: bucketed answer drifted"
            assert narrow_rows == base_rows, f"x{factor}: narrow answer drifted"
            results[f"x{factor}"] = {
                "orders_rows": n_orders,
                "plain_sec": plain_s,
                "bucketed_sec": buck_s,
                "narrow_w4_sec": narrow_s,
            }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    line = {
        "metric": "asof_history_depth_scaling",
        "base": BASE,
        "lookback_years": LOOKBACK_YEARS,
        "results": results,
        "note": "same output asserted at every depth; plain's candidate set "
        "grows with history, bucketed's is capped by the (key, bucket) "
        "equi join; narrow_w4 = bucket_width lookback/4 (5 exploded left "
        "copies — the round-11 multi-bucket path) trading left fan-out "
        "for finer candidate pruning",
    }
    print(json.dumps(line))
    with open(os.path.join(_REPO, "bench", "asof_results.json"), "w") as f:
        json.dump(line, f, indent=1)


if __name__ == "__main__":
    main()
