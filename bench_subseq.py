"""Scaling-curve experiment for the subsequence similarity search: is
xh_subseq_search linear in the number of (user, window) pairs, and does
per-user parallelism actually carry the plan (the window is partitioned
on user_id, so more users must mean more parallelism, not more skew)?

Replicates sf0.1 events x1 / x4 / x16 with user_ids shifted per replica:
each replica reproduces every original user's series under a fresh id,
so the window count grows linearly while each user's per-partition sort
stays constant size — the shape a 100 TB event store has (more users,
not longer series). A super-linear curve here would mean the per-user
window is NOT the dominant term (e.g. a hidden global sort).

Prints one JSON line; recorded to bench/subseq_results.json and graded
against SCALE.md's "linear in windows, parallel in users" claim.

Run: python bench_subseq.py   (env: SPARK_GRAFT_SCALING_BASE, default
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

from hadoop_copier_spark.queries import REGISTRY  # noqa: E402
from hadoop_copier_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SCALING_BASE", "/root/testdata/sf0.1")
FACTORS = (1, 4, 16)


def replicate(spark, out_dir: str, factor: int) -> str:
    e = spark.read.parquet(os.path.join(BASE, "events.parquet"))
    n_users = e.agg(F.max("user_id")).collect()[0][0] + 1
    n_events = e.agg(F.max("event_id")).collect()[0][0] + 1
    reps = [
        e.select(
            (F.col("event_id") + F.lit(i * n_events)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(i * n_users)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for i in range(factor)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    path = os.path.join(out_dir, f"x{factor}")
    out.write.mode("overwrite").parquet(os.path.join(path, "events.parquet"))
    return path


def main() -> None:
    spark = get_spark()
    q = REGISTRY["xh_subseq_search"]
    scratch = tempfile.mkdtemp(prefix="hcs_subseq_bench_")
    results = {}
    try:
        for f in FACTORS:
            path = replicate(spark, scratch, f)
            # warm the scan cache, then one timed pass (bench.py protocol)
            q.fn(spark, path).collect()
            t0 = time.time()
            rows = q.fn(spark, path).collect()
            wall = round(time.time() - t0, 3)
            results[f"x{f}"] = {"wall_sec": wall, "top_rows": len(rows)}
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    ratio = round(
        results["x16"]["wall_sec"] / max(results["x1"]["wall_sec"], 1e-9), 2
    )
    line = {
        "metric": "subseq_search_scaling",
        "base": BASE,
        "results": results,
        "x16_over_x1": ratio,
    }
    print(json.dumps(line))
    with open(os.path.join(_REPO, "bench", "subseq_results.json"), "w") as fh:
        json.dump(line, fh, indent=1)


if __name__ == "__main__":
    main()
