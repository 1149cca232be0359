"""Fire the hard-negatives query-side broadcast bound ORGANICALLY
(round 16 follow-through on VERDICT r15 #6): the forced-path test
(tests/test_llm_ops.py) proves the IVF fallback with max_broadcast_bytes
pinned to 1; this probe proves the REAL bound fires from data volume
alone — the _CHI2_MAX_DOCS x640 discipline applied to
operators/similarity.hard_negatives_topk.

Setup: candidates = the sf0.01 embedding table (bounded so the pruned
pair volume stays a local[32] workload); queries = the sf1 embedding
table (20k rows) replicated x8 with shifted vec_ids (the make_sf1.py
key-shift discipline, applied in-probe — payloads verbatim, ids
disjoint), landing at 160k 64-dim rows whose probed byte estimate
n_queries x (dim x 8 + 96) ~ 97 MB crosses
_HARDNEG_BROADCAST_MAX_BYTES (64 MiB, which fires at ~110k rows) from
DATA VOLUME alone — no knob is touched. The probe then:

  1. asserts the byte estimate really exceeds the bound (recomputed
     from the same probe cache the operator filled);
  2. asserts the plan shape is the fallback: the ANALYZED plan carries
     NO broadcast hint (the fallback never forces one — the first probe
     run showed AQE then broadcasting the 2k-row CANDIDATE side from
     runtime stats, which is exactly the point: strategy becomes the
     planner's call, never a pin on the unbounded query side), vs the
     10-query control whose analyzed plan must carry exactly the
     forced query-side hint the contract query uses;
  3. sanity-checks output semantics on both paths (k-bounded ranks,
     label mismatch everywhere);
  4. records walls and row counts.

Writes bench/hardneg_probe_results.json and prints one JSON line —
the measured backing for SCALE.md's "query set too large to broadcast"
sentence.

Run: python bench_hardneg_probe.py   (env: SPARK_GRAFT_HARDNEG_CAND,
default /root/testdata/sf0.01; SPARK_GRAFT_HARDNEG_QUERY, default
/root/repo/.sf1 — regenerate with make_sf1.py if absent)
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

from hadoop_copier_spark.operators import similarity as sim  # noqa: E402
from hadoop_copier_spark.session import get_spark  # noqa: E402

CAND = os.environ.get("SPARK_GRAFT_HARDNEG_CAND", "/root/testdata/sf0.01")
QUERY = os.environ.get(
    "SPARK_GRAFT_HARDNEG_QUERY", os.path.join(_REPO, ".sf1")
)


def _plans(df):
    analyzed = df._jdf.queryExecution().analyzed().toString()
    df.count()  # run so AQE finalizes
    executed = df._jdf.queryExecution().executedPlan().toString()
    return analyzed, executed


def main() -> None:
    spark = get_spark()
    cand = spark.read.parquet(f"{CAND}/embeddings.parquet")
    base_q = spark.read.parquet(f"{QUERY}/embeddings.parquet")
    small_q = cand.filter(F.col("vec_id") < 10)

    # x8 key-shift replication (payloads verbatim, vec_ids disjoint) to
    # cross the 64 MiB bound organically from row volume
    shift = (base_q.agg(F.max("vec_id")).first()[0] or 0) + 1
    big_q = base_q
    for i in range(1, 8):
        big_q = big_q.unionByName(
            base_q.withColumn("vec_id", F.col("vec_id") + F.lit(i * shift))
        )

    n_q = big_q.filter(F.col("embedding").isNotNull()).count()
    dim = int(
        big_q.select(F.size("embedding").alias("d")).first()["d"]
    )
    est = n_q * (dim * 8 + 96)
    bound = sim._HARDNEG_BROADCAST_MAX_BYTES
    assert est > bound, (
        f"probe precondition failed: {n_q} x (dim {dim}) estimates "
        f"{est} B <= bound {bound} B — query fixture too small"
    )

    t0 = time.perf_counter()
    big = sim.hard_negatives_topk(cand, big_q, k=5)
    analyzed_big, plan_big = _plans(big)
    wall_big = round(time.perf_counter() - t0, 3)
    n_big = big.count()
    # fallback shape: no FORCED broadcast anywhere (no hint in the
    # analyzed plan); whether AQE broadcasts the small candidate side
    # from runtime stats is its call and recorded, not asserted
    fellback = "ResolvedHint" not in analyzed_big and "UnresolvedHint" not in analyzed_big
    aqe_broadcast_candidates = "BroadcastExchange" in plan_big
    sample = big.limit(2000).collect()
    ok_big = bool(sample) and all(
        r["q_label"] != r["n_label"] and 1 <= r["rank"] <= 5 for r in sample
    )

    t0 = time.perf_counter()
    small = sim.hard_negatives_topk(cand, small_q, k=5)
    analyzed_small, plan_small = _plans(small)
    wall_small = round(time.perf_counter() - t0, 3)
    rows_small = small.collect()
    ok_small = bool(rows_small) and all(
        r["q_label"] != r["n_label"] and 1 <= r["rank"] <= 5
        for r in rows_small
    )
    broadcast_kept = (
        "ResolvedHint" in analyzed_small or "UnresolvedHint" in analyzed_small
    ) and "BroadcastExchange" in plan_small

    result = {
        "metric": "hardneg_broadcast_probe",
        "bound_bytes": bound,
        "big_query_side": {
            "n_queries": n_q,
            "dim": dim,
            "est_bytes": est,
            "fired_organically": fellback,
            "aqe_broadcast_small_candidate_side": aqe_broadcast_candidates,
            "wall_sec": wall_big,
            "n_result_rows": n_big,
            "labels_and_ranks_ok": ok_big,
        },
        "control_10_queries": {
            "broadcast_path_kept": broadcast_kept,
            "wall_sec": wall_small,
            "n_result_rows": len(rows_small),
            "labels_and_ranks_ok": ok_small,
        },
        "loadavg_1m_5m_15m": [round(x, 2) for x in os.getloadavg()],
    }
    with open(
        os.path.join(_REPO, "bench", "hardneg_probe_results.json"), "w"
    ) as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    assert fellback and broadcast_kept and ok_big and ok_small


if __name__ == "__main__":
    main()
