"""Streaming subsequence-matcher bench (VERDICT r8 #7): wall clock and
per-micro-batch state growth for ``subseq_match_stateful``
(streaming/stateful.py), the applyInPandasWithState twin of
xh_subseq_search.

What it proves, per SCALE.md's stateful-streaming claims:

* the wall for consuming sf0.1 events as ~20 time-bucket micro-batches
  (the same replay writer BENCH-6 uses — no global sort);
* state size per micro-batch (``numRowsTotal`` = one state row per user):
  it must PLATEAU at the user count — the O(m)-per-user tail-buffer
  design — rather than grow with events consumed;
* output equivalence: the emitted window set, reduced by the registered
  query's ordering, equals the batch operator's top-20 exactly.

Records the result NEXT TO the BENCH-6 record in
``bench/streaming_results.json`` (the file becomes a dict of named
records; the old single-record layout is migrated under "bench6").

Run: python bench_streaming_subseq.py
(env: SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1)
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

from hadoop_copier_spark.queries import REGISTRY  # noqa: E402
from hadoop_copier_spark.session import get_spark  # noqa: E402
from hadoop_copier_spark.streaming import (  # noqa: E402
    replay_events_time_buckets,
    subseq_match_stateful,
)
from hadoop_copier_spark.streaming.jobs import _read_stream  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_CHUNKS = 20
RESULTS = os.path.join(_REPO, "bench", "streaming_results.json")


def main() -> None:
    spark = get_spark()
    replay_root = tempfile.mkdtemp(prefix="hcs_subseq_bench_")
    try:
        src = replay_events_time_buckets(
            spark, SF, os.path.join(replay_root, "src"), n_chunks=N_CHUNKS
        )
        t0 = time.perf_counter()
        q = (
            subseq_match_stateful(_read_stream(spark, src))
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("bench_subseq")
            .start()
        )
        q.processAllAvailable()
        wall = round(time.perf_counter() - t0, 3)
        batches = []
        for p in q.recentProgress:
            so = (p.get("stateOperators") or [{}])[0]
            batches.append(
                {
                    "batch": p.get("batchId"),
                    "input_rows": p.get("numInputRows"),
                    "state_rows_total": so.get("numRowsTotal"),
                    "state_rows_updated": so.get("numRowsUpdated"),
                    "trigger_ms": (p.get("durationMs") or {}).get("triggerExecution"),
                }
            )
        q.stop()

        got = [
            (r.user_id, r.anchor_event_id, r.dist_u6)
            for r in spark.sql("SELECT * FROM bench_subseq").collect()
        ]
        unique = len(set(got)) == len(got)
        got_top = sorted(got, key=lambda t: (t[2], t[0], t[1]))[:20]
        batch_top = [
            (r.user_id, r.event_id, r.dist_u6)
            for r in REGISTRY["xh_subseq_search"].fn(spark, SF).collect()
        ]
        state_totals = [
            b["state_rows_total"] for b in batches if b["state_rows_total"]
        ]
        record = {
            "metric": "subseq_stateful_stream",
            "sf_dir": SF,
            "wall_sec": wall,
            "micro_batches": len(batches),
            "n_windows_emitted": len(got),
            "no_window_emitted_twice": unique,
            "top20_equals_batch_operator": got_top == batch_top,
            "state_rows_final": state_totals[-1] if state_totals else None,
            "state_rows_max": max(state_totals) if state_totals else None,
            "state_plateaus_at_user_count": bool(
                state_totals and state_totals[-1] == max(state_totals)
            ),
            "batches": batches,
        }
    finally:
        shutil.rmtree(replay_root, ignore_errors=True)

    existing = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            prev = json.load(f)
        # migrate the original single-record (BENCH-6) layout
        existing = prev if "bench6" in prev else {"bench6": prev}
    existing["subseq_stateful"] = record
    with open(RESULTS, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps({k: v for k, v in record.items() if k != "batches"}))


if __name__ == "__main__":
    main()
