"""Stage-attribute the r15 driver bench's three 2x-gate violations
(VERDICT r15 #2 — the bench/heavy_hitters_profile_r14.json discipline):
xh_incremental_dedup (0.437 s baseline -> 1.026 s driver, 2.3x),
xh_inverted_index (0.455 -> 1.517 s, 3.3x) and xh_kappa_langid
(1.383 -> 2.842 s, 2.05x). The same-code idle-box r15 run recorded 0
violations, and the x64 docs probe shows kappa sub-linear — so the
hypothesis to test is the xh_heavy_hitters r14 pattern:
first-invocation whole-stage-codegen compile + ambient driver-box load,
not a plan regression.

Method: on one warm session (fixtures pre-warmed the way bench.py
warms), each op runs TRIALS end-to-end (bench.py's own df.count()
timing); trial 1 carries the codegen-compile cost, the warm tail is
the plan's steady-state wall. Alongside, each op's dominant input
stage runs separately so a real regression would show WHERE:

  xh_incremental_dedup — stage = history-side distinct content-hash
      build (scan + md5 + distinct exchange); the remainder is the
      batch window + hash join + rollup.
  xh_inverted_index   — stage = tokenize + array_distinct + explode
      (the map-side scan work); the remainder is the one token
      exchange feeding window + agg + TakeOrdered.
  xh_kappa_langid     — stage = the composed langid confusion matrix
      (xh_langid_ngram, the shared frame); the remainder is the
      marginal/kappa arithmetic on <=L^2 rows.

Writes bench/gate_profile_r16.json and prints one JSON line; the
SCALE.md round-16 adjudication paragraph reads from this artifact.

Run: python bench_gate_profile.py   (env: SPARK_GRAFT_SF_DIR,
default /root/testdata/sf0.1; SPARK_GRAFT_PROFILE_TRIALS, default 4)
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

from hadoop_copier_spark.queries import REGISTRY  # noqa: E402
from hadoop_copier_spark.queries.base import tbl  # noqa: E402
from hadoop_copier_spark.queries.text_index import _tokens_col  # noqa: E402
from hadoop_copier_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TRIALS = int(os.environ.get("SPARK_GRAFT_PROFILE_TRIALS", "4"))

# r15 driver artifact values (BENCH_r15.json gate_violations)
DRIVER_R15 = {
    "xh_incremental_dedup": [0.437, 1.026],
    "xh_inverted_index": [0.455, 1.517],
    "xh_kappa_langid": [1.383, 2.842],
}


def _time(fn, n=TRIALS):
    out = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def main() -> None:
    spark = get_spark()
    tbl(spark, SF_DIR, "documents").count()  # warm the scan like bench.py

    stages = {
        "xh_incremental_dedup": lambda: (
            tbl(spark, SF_DIR, "documents")
            .filter(F.col("doc_id") % 10 < 8)
            .select(F.md5("text").alias("th"))
            .distinct()
            .count()
        ),
        "xh_inverted_index": lambda: (
            tbl(spark, SF_DIR, "documents")
            .select(
                "doc_id", F.explode(F.array_distinct(_tokens_col())).alias("t")
            )
            .filter(F.col("t") != "")
            .count()
        ),
        "xh_kappa_langid": lambda: (
            REGISTRY["xh_langid_ngram"].fn(spark, SF_DIR).count()
        ),
    }

    result: dict = {
        "meta": {
            "round": 16,
            "sf_dir": SF_DIR,
            "why": (
                "VERDICT r15 #2: the r15 driver bench recorded these three "
                "as 2x-gate violations while the same-code idle-box run "
                "recorded zero; stage-attributed here before adjudication."
            ),
            "method": (
                f"{TRIALS} end-to-end trials per op on one warm session "
                "(bench.py's df.count() timing; trial 1 carries codegen "
                "compile), plus the op's dominant input stage alone"
            ),
        },
        "ops": {},
    }
    for name, base_driver in DRIVER_R15.items():
        q = REGISTRY[name]
        full = _time(lambda: q.fn(spark, SF_DIR).count())
        stage = _time(stages[name], n=3)
        warm = round(min(full[1:]), 3)
        base = base_driver[0]
        result["ops"][name] = {
            "full_trials_s": full,
            "input_stage_trials_s": stage,
            "warm_full_s": warm,
            "quiet_baseline_s": base,
            "r15_driver_s": base_driver[1],
            "warm_vs_baseline": round(warm / base, 2),
            "gate_would_fire_warm": bool(
                warm > 2 * base and warm > base + 0.5
            ),
        }
    result["loadavg_1m_5m_15m"] = [round(x, 2) for x in os.getloadavg()]
    with open(os.path.join(_REPO, "bench", "gate_profile_r16.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({
        "metric": "gate_profile_r16",
        **{
            n: {
                "warm_s": v["warm_full_s"],
                "baseline_s": v["quiet_baseline_s"],
                "ratio": v["warm_vs_baseline"],
                "fires": v["gate_would_fire_warm"],
            }
            for n, v in result["ops"].items()
        },
    }))


if __name__ == "__main__":
    main()
