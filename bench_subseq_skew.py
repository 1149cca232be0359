"""Hot-user skew probe for the subsequence search (round 18): measures
the straggler xh_subseq_search's per-user window develops when ONE user
owns the series, against xh_subseq_blocked's overlapped row-blocking —
the mitigation SCALE.md carried as "documented not implemented" until
this round.

Fixture: sf0.1 events replicated x{1,4,16} with every replica assigned
to user_id 0 (event_ids shifted for a deterministic tiebreak) — one
series of 100k/400k/1.6M rows. The per-user-window plan must sort the
whole series in ONE task (windows are not AQE-splittable); the blocked
plan's largest partition is min(events per (user, day),
block_rows + m-1) — both recorded per scale alongside the two walls
and the asserted-equal top-20.

Prints one JSON line; records bench/subseq_skew_results.json (cited
from SCALE.md). Run: python bench_subseq_skew.py
Env: SPARK_GRAFT_SCALING_BASE (default /root/testdata/sf0.1),
     SPARK_GRAFT_SKEW_SCALES (default "1,4,16").
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
SCALES = [
    int(s) for s in os.environ.get("SPARK_GRAFT_SKEW_SCALES", "1,4,16").split(",")
]


def write_hot_user(spark, out_dir: str, factor: int) -> str:
    e = spark.read.parquet(os.path.join(BASE, "events.parquet"))
    n_events = e.agg(F.max("event_id")).first()[0] + 1
    reps = [
        e.select(
            (F.col("event_id") + F.lit(i * n_events)).alias("event_id"),
            "ts",
            F.lit(0).cast("long").alias("user_id"),  # ONE user owns it all
            "event_type",
            "value",
            "props",
        )
        for i in range(factor)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    out.write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))
    return out_dir


def main() -> None:
    spark = get_spark(app_name="hcs-subseq-skew")
    rows = []
    tmp_root = tempfile.mkdtemp(prefix="hcs_subseq_skew_")
    try:
        for k in SCALES:
            sf_dir = write_hot_user(spark, os.path.join(tmp_root, f"x{k}"), k)
            e = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
            n = e.count()
            max_day_rows = (
                e.groupBy(
                    (F.col("ts").cast("timestamp").cast("long") / 86400).cast("long")
                )
                .count()
                .agg(F.max("count"))
                .first()[0]
            )
            t0 = time.perf_counter()
            plain = REGISTRY["xh_subseq_search"].fn(spark, sf_dir).collect()
            wall_plain = time.perf_counter() - t0
            t0 = time.perf_counter()
            blocked = REGISTRY["xh_subseq_blocked"].fn(spark, sf_dir).collect()
            wall_blocked = time.perf_counter() - t0
            assert list(map(tuple, plain)) == list(map(tuple, blocked)), (
                f"top-20 diverged at x{k}"
            )
            rows.append(
                {
                    "x_scale": k,
                    "n_events_one_user": n,
                    "plain_sort_partition_rows": n,  # whole series, one task
                    "blocked_max_time_block_rows": int(max_day_rows),
                    "blocked_row_block_rows": 65536 + 7,
                    "wall_plain_sec": round(wall_plain, 3),
                    "wall_blocked_sec": round(wall_blocked, 3),
                    "top20_equal": True,
                }
            )
            print(json.dumps(rows[-1]), file=sys.stderr)
    finally:
        shutil.rmtree(tmp_root, ignore_errors=True)

    record = {
        "metric": "subseq_hot_user_skew",
        "base": BASE,
        "note": (
            "one user owns the whole corpus; plain = per-user window "
            "(one-task sort of the full series), blocked = overlapped "
            "row-blocking (xh_subseq_blocked); walls include the shared "
            "top-20 tail; top-20 asserted equal per scale"
        ),
        "rows": rows,
        "loadavg_1m_5m_15m": [round(x, 2) for x in os.getloadavg()],
    }
    with open(os.path.join(_REPO, "bench", "subseq_skew_results.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record["rows"]))


if __name__ == "__main__":
    main()
