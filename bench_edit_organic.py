"""Organic miss-rate companion for the edit-block planted sweep
(VERDICT r17 #5): the 0.990 planted-recall number in
bench/edit_tuning_results.json measures mutation classes CONSTRUCTED to
stress the block; this runs xh_edit_recall_eval's audit with the bound
REMOVED — exact Levenshtein <= 3 pairs vs production blocked candidates
over the FULL documents corpus at sf0.1 and (when generated) the x10
sf1 fixture — and records organic tp/fp/fn + integer-ppm precision/
recall as an ``organic_audit`` block appended INTO the same artifact,
so the planted and organic numbers live side by side.

Run: python bench_edit_organic.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_SF1_DIR (default <repo>/.sf1, skipped if absent).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from hadoop_copier_spark.session import get_spark  # noqa: E402

ARTIFACT = os.path.join(_REPO, "bench", "edit_tuning_results.json")


def main() -> None:
    spark = get_spark(app_name="hcs-edit-organic")
    from hadoop_copier_spark.queries.dedup_oracle import _edit_recall_frame

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", os.path.join(_REPO, ".sf1"))
    targets = [("sf0.1", sf01)]
    if os.path.isdir(sf1):
        targets.append(("sf1", sf1))

    rows = []
    for label, sf_dir in targets:
        t0 = time.perf_counter()
        r = _edit_recall_frame(spark, sf_dir, max_id=None).first().asDict()
        r = {k: int(v) for k, v in r.items()}
        row = {
            "sf": label,
            "audit_bound": "full corpus (max_id=None)",
            "wall_sec": round(time.perf_counter() - t0, 3),
            **r,
        }
        rows.append(row)
        print(json.dumps(row), file=sys.stderr)

    with open(ARTIFACT) as f:
        record = json.load(f)
    record["organic_audit"] = {
        "note": (
            "VERDICT r17 #5: full-corpus (unbounded) xh_edit_recall_eval "
            "audit — the ORGANIC companion to the planted sweep's 0.990; "
            "fn pairs here are real corpus pairs the production block "
            "misses (the declared both-ends miss class)"
        ),
        "rows": rows,
        "loadavg_1m_5m_15m": [round(x, 2) for x in os.getloadavg()],
    }
    with open(ARTIFACT, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record["organic_audit"]))


if __name__ == "__main__":
    main()
