"""r19 §1 measurement probe: where does the streaming micro-batch floor go?

Phase-times xp_stream_stream_join (replay write / stream run / equivalence)
and the BENCH-6 tumbling block, and dumps the per-batch durationMs maps
(queryPlanning, getBatch, addBatch, walCommit, commitOffsets, triggerExecution)
so the ~1 s/micro-batch claim is attributed, not assumed. Sweeps knobs via
env: SPARK_GRAFT_SSJ_PARTS (state partitions), SPARK_GRAFT_STATE_PROVIDER
(rocksdb|hdfs), SPARK_GRAFT_CKPT_SHM (1 = checkpoint dir on /dev/shm).

    python bench_streaming_floor.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from hadoop_copier_spark.queries import REGISTRY  # noqa: E402
from hadoop_copier_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    extra = {}
    if os.environ.get("SPARK_GRAFT_STATE_PROVIDER") == "rocksdb":
        extra["spark.sql.streaming.stateStore.providerClass"] = (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        )
    if os.environ.get("SPARK_GRAFT_CKPT_SHM") == "1":
        ckpt = f"/dev/shm/hcs_ckpt_{os.getpid()}"
        os.makedirs(ckpt, exist_ok=True)
        extra["spark.sql.streaming.checkpointLocation"] = ckpt
        extra["spark.sql.streaming.forceDeleteTempCheckpointLocation"] = "true"
    spark = get_spark(
        app_name="hcs-stream-floor", cpus=cpus, shuffle_partitions=int(cpus),
        extra_conf=extra,
    )
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "1000")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    from pyspark.sql import functions as F  # noqa: E402

    from hadoop_copier_spark.queries.base import scratch_dir  # noqa: E402
    from hadoop_copier_spark.streaming import (  # noqa: E402
        replay_events_split_buckets,
        replay_events_time_buckets,
        stream_interval_join,
        stream_tumbling_counts,
    )
    from hadoop_copier_spark.tables import load_table  # noqa: E402

    ssj_parts = int(os.environ.get("SPARK_GRAFT_SSJ_PARTS", "8"))
    results: dict = {"config": {
        "ssj_parts": ssj_parts,
        "provider": os.environ.get("SPARK_GRAFT_STATE_PROVIDER", "hdfs"),
        "ckpt_shm": os.environ.get("SPARK_GRAFT_CKPT_SHM", "0"),
    }, "ssj": [], "bench6": []}

    for rep in range(reps):
        rec: dict = {}
        spark.sparkContext.setJobDescription(f"ssj rep{rep}: replay write")
        out = scratch_dir("xp_stream_stream_join")
        t0 = time.perf_counter()
        left_dir, right_dir = replay_events_split_buckets(spark, sf_dir, out, n_chunks=2)
        rec["replay_write"] = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(f"ssj rep{rep}: stream")
        t0 = time.perf_counter()
        q = stream_interval_join(
            spark, left_dir, right_dir, f"ssj_floor_{rep}", shuffle_partitions=ssj_parts
        )
        try:
            q.processAllAvailable()
            rec["stream_run"] = round(time.perf_counter() - t0, 3)
            prog = list(q.recentProgress or [])
            rec["n_batches"] = len(prog)
            rec["per_batch_durationMs"] = [dict(p["durationMs"]) for p in prog]
            t0 = time.perf_counter()
            got = spark.sql(f"SELECT l_id, r_id FROM ssj_floor_{rep}")
            n_sink = got.count()
            rec["sink_count"] = round(time.perf_counter() - t0, 3)
            rec["n_pairs_sink"] = n_sink
        finally:
            q.stop()
        # equivalence phase exactly as the query spells it
        spark.sparkContext.setJobDescription(f"ssj rep{rep}: equivalence")
        t0 = time.perf_counter()
        e = load_table(spark, sf_dir, "events")
        left = e.filter(F.col("event_id") % 2 == 0).select(
            F.col("event_id").alias("l_id"), F.col("user_id").alias("l_user"),
            F.col("ts").alias("l_ts"))
        right = e.filter(F.col("event_id") % 2 != 0).select(
            F.col("event_id").alias("r_id"), F.col("user_id").alias("r_user"),
            F.col("ts").alias("r_ts"))
        batch = left.join(
            right,
            (F.col("l_user") == F.col("r_user"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 5 MINUTES")),
            "inner",
        ).select("l_id", "r_id")
        got = spark.sql(f"SELECT l_id, r_id FROM ssj_floor_{rep}")
        stats = (
            got.select("l_id", "r_id").distinct().withColumn("__g", F.lit(1))
            .join(batch.select("l_id", "r_id").distinct().withColumn("__b", F.lit(1)),
                  ["l_id", "r_id"], "full_outer")
            .agg(F.coalesce(F.sum("__g"), F.lit(0)).alias("n_pairs"),
                 F.coalesce(F.sum(F.when(F.col("__g").isNull(), 1)), F.lit(0)).alias("missing"),
                 F.coalesce(F.sum(F.when(F.col("__b").isNull(), 1)), F.lit(0)).alias("extra"))
            .collect()[0]
        )
        rec["equivalence"] = round(time.perf_counter() - t0, 3)
        rec["row"] = [int(stats["n_pairs"]), rec["n_batches"],
                      int(stats["missing"]) == 0 and int(stats["extra"]) == 0]
        results["ssj"].append(rec)
        print(json.dumps(rec))

    # BENCH-6 tumbling block
    import shutil
    import tempfile
    for rep in range(reps):
        rec = {}
        replay_root = tempfile.mkdtemp(prefix="hcs_floor6_")
        try:
            t0 = time.perf_counter()
            src = replay_events_time_buckets(
                spark, sf_dir, os.path.join(replay_root, "src"), n_chunks=20)
            rec["replay_write"] = round(time.perf_counter() - t0, 3)
            b6_parts = os.environ.get("SPARK_GRAFT_B6_PARTS")
            if b6_parts:
                old = spark.conf.get("spark.sql.shuffle.partitions")
                spark.conf.set("spark.sql.shuffle.partitions", b6_parts)
            t0 = time.perf_counter()
            q = stream_tumbling_counts(spark, src, f"floor6_{rep}", available_now=True)
            if b6_parts:
                spark.conf.set("spark.sql.shuffle.partitions", old)
            q.awaitTermination()
            rec["stream_run"] = round(time.perf_counter() - t0, 3)
            prog = list(q.recentProgress or [])
            rec["n_batches"] = len(prog)
            rec["per_batch_durationMs"] = [dict(p["durationMs"]) for p in prog]
        finally:
            shutil.rmtree(replay_root, ignore_errors=True)
        results["bench6"].append(rec)
        print(json.dumps({k: v for k, v in rec.items() if k != "per_batch_durationMs"}))

    with open(os.path.join(_REPO, "bench", "streaming_floor_probe.json"), "a") as f:
        f.write(json.dumps(results) + "\n")
    # compact per-phase medians
    def med(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2]
    print("== ssj medians:", json.dumps({
        k: med([r[k] for r in results["ssj"]])
        for k in ("replay_write", "stream_run", "equivalence")
    }))
    print("== bench6 median stream_run:", med([r["stream_run"] for r in results["bench6"]]))


if __name__ == "__main__":
    main()
