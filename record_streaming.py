"""Emit STREAMING_r{N}.json — driver-visible streaming evidence.

The streaming P checks (watermark late-data drop, streaming dedup,
exactly-once sinks across restart, stream ≡ batch equivalence for
q61/q62/q63 and the stateful subsequence matcher) live in
tests/test_streaming.py, which the driver's artifacts never surface
beyond the single `streaming_equals_batch_q61` bench row (VERDICT r12
#7). This script re-runs the SAME logic standalone and records one
structured artifact per round, so streaming correctness is inspectable
without running pytest.

Every check is explicit-micro-batch (append files + processAllAvailable)
— never wall-clock — and each records pass/fail plus the measured
quantities (drop counts, dedup counts, restart row accounting,
stream-vs-batch row counts).

    python record_streaming.py          # round from SPARK_GRAFT_ROUND
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

ROUND = int(os.environ.get("SPARK_GRAFT_ROUND", "13"))
SF = os.environ.get("SPARK_GRAFT_STREAM_SF_DIR", "/root/testdata/sf0.001")


def check_tumbling_equals_batch(spark, tmp):
    from hadoop_copier_spark.queries import REGISTRY
    from hadoop_copier_spark.streaming import (
        replay_events_chunks,
        stream_tumbling_counts,
    )

    replay = os.path.join(tmp, "replay_tumb")
    replay_events_chunks(spark, SF, replay, n_chunks=5)
    q = stream_tumbling_counts(spark, replay, "s_tumb")
    try:
        q.processAllAvailable()
        n_batches = int((q.lastProgress or {}).get("batchId", -2)) + 1
        got = {
            (r["w_start_sec"], r["event_type"]): (r["n"], r["sum_val_cents"])
            for r in spark.sql("SELECT * FROM s_tumb").collect()
        }
    finally:
        q.stop()
    batch = {
        (r["w_start_sec"], r["event_type"]): (r["n"], r["sum_val_cents"])
        for r in REGISTRY["q61"].fn(spark, SF).collect()
    }
    return {
        "stream_equals_batch": got == batch,
        "n_windows": len(got),
        "n_micro_batches": n_batches,
        "batch_query": "q61",
    }


def check_sliding_equals_batch(spark, tmp):
    from hadoop_copier_spark.queries import REGISTRY
    from hadoop_copier_spark.streaming import EVENTS_SCHEMA, replay_events_chunks

    replay = os.path.join(tmp, "replay_slide")
    replay_events_chunks(spark, SF, replay, n_chunks=5)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "2")
        .option("recursiveFileLookup", "true")
        .parquet(replay)
    )
    agg = (
        stream.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp("w.start").alias("w_start_sec"), "n")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("s_slide")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["w_start_sec"]: r["n"]
            for r in spark.sql("SELECT * FROM s_slide").collect()
        }
    finally:
        q.stop()
    batch = {
        r["w_start_sec"]: r["n"] for r in REGISTRY["q62"].fn(spark, SF).collect()
    }
    return {
        "stream_equals_batch": got == batch,
        "n_windows": len(got),
        "batch_query": "q62",
    }


def check_session_equals_batch(spark, tmp):
    from hadoop_copier_spark.queries import REGISTRY
    from hadoop_copier_spark.streaming import EVENTS_SCHEMA
    from hadoop_copier_spark.tables import load_table

    src = os.path.join(tmp, "sess_src")
    e = load_table(spark, SF, "events").withColumn(
        "ts", F.date_trunc("second", F.col("ts"))
    )
    e.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))
    q = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(src)
        .withWatermark("ts", "1 minute")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp("w.start").alias("session_start_sec"),
            "n_events",
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("s_sess")
        .start()
    )
    try:
        q.processAllAvailable()
        # far-future sentinel advances the watermark so every real
        # session finalizes in append mode
        sentinel = spark.createDataFrame(
            [(999999, dt.datetime(2030, 1, 1), 999999, "x", 0.0, "{}")],
            schema=EVENTS_SCHEMA,
        )
        sentinel.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b2"))
        q.processAllAvailable()
        got = {
            (r["user_id"], r["session_start_sec"]): r["n_events"]
            for r in spark.sql("SELECT * FROM s_sess").collect()
            if r["user_id"] != 999999
        }
    finally:
        q.stop()
    batch = {
        (r["user_id"], r["session_start_sec"]): r["n_events"]
        for r in REGISTRY["q63"].fn(spark, SF).collect()
    }
    return {
        "stream_equals_batch": got == batch,
        "n_sessions": len(got),
        "batch_query": "q63",
    }


def check_streaming_dedup(spark, tmp):
    from hadoop_copier_spark.streaming import (
        stream_dedup,
        stream_dedup_within_watermark,
    )
    from hadoop_copier_spark.tables import load_table

    res = {}
    e = load_table(spark, SF, "events").limit(100)
    for label, factory in (
        ("drop_duplicates", stream_dedup),
        ("within_watermark", stream_dedup_within_watermark),
    ):
        src = os.path.join(tmp, f"dedup_{label}")
        e.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))
        q = factory(spark, src, f"s_dedup_{label}")
        try:
            q.processAllAvailable()
            # re-send the SAME 100 events as a second micro-batch
            e.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b2"))
            q.processAllAvailable()
            ids = [
                r["event_id"]
                for r in spark.sql(f"SELECT * FROM s_dedup_{label}").collect()
            ]
        finally:
            q.stop()
        res[label] = {
            "n_sent": 200,
            "n_emitted": len(ids),
            "n_distinct": len(set(ids)),
            "resent_suppressed": len(ids) == len(set(ids)) == 100,
        }
    res["pass"] = all(v["resent_suppressed"] for v in res.values() if isinstance(v, dict))
    return res


def check_watermark_drops_late(spark, tmp):
    from hadoop_copier_spark.streaming import EVENTS_SCHEMA

    src = os.path.join(tmp, "late_src")
    base = dt.datetime(2024, 6, 1, 10, 0, 0)

    def mk(rows, sub):
        spark.createDataFrame(rows, schema=EVENTS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, sub))

    mk(
        [
            (1, base, 7, "click", 1.0, "{}"),
            (2, base + dt.timedelta(minutes=5), 7, "click", 1.0, "{}"),
            (3, base + dt.timedelta(hours=1), 7, "click", 1.0, "{}"),
        ],
        "b1",
    )
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp("w.start").alias("w_start"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("s_late")
        .start()
    )
    try:
        q.processAllAvailable()
        mk([(4, base + dt.timedelta(minutes=1), 7, "click", 1.0, "{}")], "b2")  # LATE
        q.processAllAvailable()
        mk([(5, base + dt.timedelta(hours=3), 7, "click", 1.0, "{}")], "b3")
        q.processAllAvailable()
        rows = {
            r["w_start"]: r["n"] for r in spark.sql("SELECT * FROM s_late").collect()
        }
    finally:
        q.stop()
    w0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    finalized = rows.get(w0)
    return {
        "finalized_window_count": finalized,
        "n_late_events_sent": 1,
        "n_late_events_dropped": 1 if finalized == 2 else 0,
        "pass": finalized == 2,
    }


def check_exactly_once_foreachbatch(spark, tmp):
    from hadoop_copier_spark.streaming import EVENTS_SCHEMA
    from hadoop_copier_spark.tables import load_table

    src = os.path.join(tmp, "eos_src")
    out = os.path.join(tmp, "eos_out")
    chk = os.path.join(tmp, "eos_chk")
    e = load_table(spark, SF, "events").limit(50)
    e.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))

    def writer(df, batch_id):
        df.write.mode("overwrite").parquet(os.path.join(out, f"batch={batch_id}"))

    def run():
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        q = (
            stream.select("event_id", "user_id")
            .writeStream.foreachBatch(writer)
            .option("checkpointLocation", chk)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run()
    run()  # restart over the same checkpoint: no reprocessing
    got = spark.read.option("recursiveFileLookup", "true").parquet(out).collect()
    return {
        "n_input": 50,
        "n_output_after_restart": len(got),
        "n_distinct_ids": len({r["event_id"] for r in got}),
        "pass": len(got) == 50 and len({r["event_id"] for r in got}) == 50,
    }


def check_failed_batch_midwrite_restart(spark, tmp):
    """VERDICT r16 #8 — failure injection: a foreachBatch micro-batch
    crashes MID-WRITE (data materialized, manifest commit never lands —
    the reference's PARTIALLY_FAILED state applied to the streaming
    sink); restart from the same checkpoint must yield exactly-once
    committed output whose tumbling aggregate equals batch q61, with the
    orphaned partial write invisible to snapshot readers. Same logic as
    tests/test_streaming.py::test_failed_batch_midwrite_restart_exactly_once."""
    from hadoop_copier_spark.operators.snapshots import (
        list_versions,
        read_snapshot,
    )
    from hadoop_copier_spark.queries import REGISTRY
    from hadoop_copier_spark.streaming import EVENTS_SCHEMA, replay_events_chunks
    from hadoop_copier_spark.streaming.snapshot_sink import (
        committed_batch_ids,
        snapshot_batch_writer,
    )

    src = os.path.join(tmp, "fi_src")
    table = os.path.join(tmp, "fi_table")
    chk = os.path.join(tmp, "fi_chk")
    replay_events_chunks(spark, SF, src, n_chunks=8)
    inner = snapshot_batch_writer(table)
    orphan = os.path.join(table, "data", "inflight-crashed")
    state = {"planted": False}

    def writer(df, batch_id):
        if batch_id == 3 and not state["planted"]:
            state["planted"] = True
            df.write.mode("overwrite").parquet(orphan)
            raise RuntimeError("planted mid-write failure (batch 3)")
        inner(df, batch_id)

    def start():
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        return (
            stream.writeStream.foreachBatch(writer)
            .option("checkpointLocation", chk)
            .start()
        )

    q = start()
    died = False
    try:
        q.processAllAvailable()
    except Exception:
        died = True
    finally:
        try:
            q.stop()
        except Exception:
            pass
    failed_uncommitted = 3 not in committed_batch_ids(table)

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    ids = committed_batch_ids(table)
    contiguous = ids == set(range(max(ids) + 1)) if ids else False
    one_version_per_batch = len(list_versions(table)) == len(ids)
    got = {
        (r["w_start_sec"], r["event_type"]): (r["n"], r["sum_val_cents"])
        for r in (
            read_snapshot(spark, table)
            .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast(
                        "bigint"
                    )
                ).alias("sum_val_cents"),
            )
            .select(
                F.unix_timestamp(F.col("w.start")).alias("w_start_sec"),
                "event_type",
                "n",
                "sum_val_cents",
            )
            .collect()
        )
    }
    batch = {
        (r["w_start_sec"], r["event_type"]): (r["n"], r["sum_val_cents"])
        for r in REGISTRY["q61"].fn(spark, SF).collect()
    }
    orphan_invisible = os.path.isdir(orphan) and not any(
        "inflight-crashed" in f
        for v in list_versions(table)
        for f in read_snapshot(spark, table, v).inputFiles()
    )
    return {
        "planted_failure_killed_query": state["planted"] and died,
        "failed_batch_uncommitted_before_restart": failed_uncommitted,
        "committed_batch_ids_contiguous": contiguous,
        "one_version_per_batch": one_version_per_batch,
        "agg_equals_batch_q61": got == batch,
        "orphan_partial_write_invisible": orphan_invisible,
        "pass": state["planted"]
        and died
        and failed_uncommitted
        and contiguous
        and one_version_per_batch
        and got == batch
        and orphan_invisible,
    }


def check_exactly_once_file_sink_midstream_restart(spark, tmp):
    from hadoop_copier_spark.tables import load_table

    src = os.path.join(tmp, "mid_src")
    out = os.path.join(tmp, "mid_out")
    chk = os.path.join(tmp, "mid_chk")
    e = load_table(spark, SF, "events").select("event_id", "user_id", "value").limit(90)
    parts = [e.filter(F.col("event_id") % 3 == i) for i in range(3)]
    parts[0].coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))
    parts[1].coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b2"))

    def start():
        stream = (
            spark.readStream.schema("event_id long, user_id long, value double")
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()  # mid-replay: only b1+b2 exist yet
    finally:
        q.stop()  # forced stop before the full dataset arrived
    parts[2].coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b3"))
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r["event_id"], r["user_id"], r["value"])
        for r in spark.read.parquet(out).collect()
    )
    want = sorted((r["event_id"], r["user_id"], r["value"]) for r in e.collect())
    return {
        "n_input": len(want),
        "n_output": len(got),
        "rows_hash_match": got == want,
        "pass": got == want,
    }


def check_subseq_matcher_equals_batch(spark, tmp):
    from hadoop_copier_spark.queries import REGISTRY
    from hadoop_copier_spark.streaming import (
        replay_events_chunks,
        subseq_match_stateful,
    )
    from hadoop_copier_spark.streaming.jobs import _read_stream

    replay = os.path.join(tmp, "replay_subseq")
    replay_events_chunks(spark, SF, replay, n_chunks=5)
    out = subseq_match_stateful(_read_stream(spark, replay))
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("s_subseq")
        .start()
    )
    try:
        q.processAllAvailable()
        got = [
            (r.user_id, r.anchor_event_id, r.dist_u6)
            for r in spark.sql("SELECT * FROM s_subseq").collect()
        ]
    finally:
        q.stop()
    no_dups = len(set(got)) == len(got)
    got_top = sorted(got, key=lambda t: (t[2], t[0], t[1]))[:20]
    batch = [
        (r.user_id, r.event_id, r.dist_u6)
        for r in REGISTRY["xh_subseq_search"].fn(spark, SF).collect()
    ]
    return {
        "n_windows_emitted": len(got),
        "no_window_emitted_twice": no_dups,
        "stream_top20_equals_batch": got_top == batch,
        "batch_query": "xh_subseq_search",
        "pass": no_dups and got_top == batch,
    }


def check_streaming_hll_merge(spark, tmp):
    """Incremental sketch maintenance: each micro-batch of documents
    contributes a shard HLL register state; foreachBatch max-merges it
    into running state (the xh_hll_merge union algebra — merge-only
    updates, no reprocessing); the final merged registers must equal
    the batch xh_hll_registers computation over the same corpus
    bit-for-bit."""
    from hadoop_copier_spark.queries import REGISTRY
    from hadoop_copier_spark.queries.quality_checks import hll_bucket_rho

    src = os.path.join(tmp, "hll_src")
    os.makedirs(src, exist_ok=True)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_chunks = 5
    for i in range(n_chunks):
        (
            docs.where(F.col("doc_id") % n_chunks == i)
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    state: dict[int, int] = {}
    batch_ids: list[int] = []

    def merge(bdf, bid):
        batch_ids.append(int(bid))
        rows = (
            hll_bucket_rho(bdf)
            .groupBy("bucket")
            .agg(F.max("rho").alias("reg"))
            .collect()  # <=256 register rows: state, not data
        )
        for r in rows:
            b = int(r["bucket"])
            state[b] = max(state.get(b, 0), int(r["reg"]))

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", os.path.join(tmp, "hll_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    merged = ",".join(str(state.get(b, 0)) for b in range(256))
    batch_regs = (
        REGISTRY["xh_hll_registers"].fn(spark, SF).collect()[0]["registers"]
    )
    return {
        "n_micro_batches": len(batch_ids),
        "n_nonzero_registers": sum(1 for v in state.values() if v > 0),
        "merged_equals_batch_registers": merged == batch_regs,
        "batch_query": "xh_hll_registers",
        "pass": merged == batch_regs and len(batch_ids) >= n_chunks,
    }


def check_streaming_cms_merge(spark, tmp):
    """Incremental Count-Min maintenance (VERDICT r13 #7, the HLL
    check's sum-merge twin): each micro-batch contributes sparse shard
    counters; foreachBatch merges them by pointwise ADDITION (the union
    algebra xh_cms_registers property-tests); the final state must
    equal the batch sketch over the same corpus bit-for-bit."""
    from hadoop_copier_spark.queries import REGISTRY
    from hadoop_copier_spark.queries.quality_checks import cms_counts

    src = os.path.join(tmp, "cms_src")
    os.makedirs(src, exist_ok=True)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_chunks = 5
    for i in range(n_chunks):
        (
            docs.where(F.col("doc_id") % n_chunks == i)
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    state: dict[tuple[int, int], int] = {}
    batch_ids: list[int] = []

    def merge(bdf, bid):
        batch_ids.append(int(bid))
        for r in cms_counts(bdf).collect():  # <=256 counter rows: state
            k = (int(r["row_id"]), int(r["bucket"]))
            state[k] = state.get(k, 0) + int(r["cnt"])

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", os.path.join(tmp, "cms_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    batch = REGISTRY["xh_cms_registers"].fn(spark, SF).collect()
    equal = len(batch) == 256 and all(
        state.get((int(r["row_id"]), int(r["bucket"])), 0) == int(r["cnt"])
        for r in batch
    )
    return {
        "n_micro_batches": len(batch_ids),
        "n_nonzero_counters": sum(1 for v in state.values() if v > 0),
        "merged_equals_batch_registers": equal,
        "batch_query": "xh_cms_registers",
        "pass": equal and len(batch_ids) >= n_chunks,
    }


def check_streaming_mg_recount(spark, tmp):
    """Incremental heavy-hitters (round 14, the sketch trio's third
    member): a driver-side weighted Misra-Gries state (K+1 counters)
    ingests each micro-batch's (token, cnt) partial-agg rows with the
    classic decrement step; the MG guarantee survives merging, so the
    exact recount over the final key set, thresholded at N/(K+1), must
    equal the batch xh_heavy_hitters output exactly."""
    from hadoop_copier_spark.queries import REGISTRY
    from hadoop_copier_spark.queries.text_index import (
        _MG_COUNTERS,
        _tokens_col,
    )

    src = os.path.join(tmp, "mg_src")
    os.makedirs(src, exist_ok=True)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_chunks = 5
    for i in range(n_chunks):
        (
            docs.where(F.col("doc_id") % n_chunks == i)
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    state: dict[str, int] = {}
    batch_ids: list[int] = []

    def merge(bdf, bid):
        batch_ids.append(int(bid))
        rows = (
            bdf.select(F.explode(_tokens_col()).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        for r in rows:
            state[r["token"]] = state.get(r["token"], 0) + int(r["cnt"])
            if len(state) > _MG_COUNTERS:
                m = min(state.values())
                for t in list(state):
                    state[t] -= m
                    if state[t] <= 0:
                        del state[t]

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", os.path.join(tmp, "mg_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    toks = docs.select(F.explode(_tokens_col()).alias("token"))
    cand = spark.createDataFrame(
        spark.sparkContext.parallelize([(t,) for t in state], 1),
        "token string",
    )
    total = toks.count()
    got = {
        (r["token"], r["cnt"])
        for r in toks.join(F.broadcast(cand), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * (_MG_COUNTERS + 1) > total)
        .collect()
    }
    batch = {
        (r["token"], r["cnt"])
        for r in REGISTRY["xh_heavy_hitters"].fn(spark, SF).collect()
    }
    return {
        "n_micro_batches": len(batch_ids),
        "n_mg_survivors": len(state),
        "recount_equals_batch_heavy_hitters": got == batch,
        "batch_query": "xh_heavy_hitters",
        "pass": got == batch
        and 0 < len(state) <= _MG_COUNTERS
        and len(batch_ids) >= n_chunks,
    }


def check_stream_static_join(spark, tmp):
    """Stream-static join (VERDICT r14 #7): the replayed event stream
    joins the STATIC customer dimension per micro-batch; the final
    per-segment counts must equal the batch join exactly."""
    from hadoop_copier_spark.streaming import (
        replay_events_chunks,
        stream_static_join_counts,
    )
    from hadoop_copier_spark.tables import load_table

    replay = os.path.join(tmp, "replay_ssj")
    replay_events_chunks(spark, SF, replay, n_chunks=5)
    customer = load_table(spark, SF, "customer")
    q = stream_static_join_counts(spark, replay, customer, "rec_ssj")
    try:
        q.processAllAvailable()
        n_batches = int((q.lastProgress or {}).get("batchId", -2)) + 1
        got = {
            r["c_mktsegment"]: r["n"]
            for r in spark.sql("SELECT * FROM rec_ssj").collect()
        }
    finally:
        q.stop()
    events = load_table(spark, SF, "events")
    batch = {
        r["c_mktsegment"]: r["n"]
        for r in events.join(customer, events.user_id == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    return {
        "stream_equals_batch": got == batch,
        "n_segments": len(got),
        "n_micro_batches": n_batches,
        "batch_query": "events join customer groupBy c_mktsegment",
    }


def check_stateful_per_key_counts(spark, tmp):
    """Stateful per-key aggregation (VERDICT r14 #7): running per-user
    event counts held in update-mode state across micro-batches; the
    final state must equal the batch groupBy count exactly."""
    from hadoop_copier_spark.streaming import (
        replay_events_chunks,
        stream_running_counts,
    )
    from hadoop_copier_spark.tables import load_table

    replay = os.path.join(tmp, "replay_run")
    replay_events_chunks(spark, SF, replay, n_chunks=5)
    q = stream_running_counts(spark, replay, "rec_run")
    try:
        q.processAllAvailable()
        n_batches = int((q.lastProgress or {}).get("batchId", -2)) + 1
        got = {
            r["user_id"]: r["n"]
            for r in spark.sql("SELECT * FROM rec_run").collect()
        }
    finally:
        q.stop()
    batch = {
        r["user_id"]: r["n"]
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    return {
        "stream_equals_batch": got == batch,
        "n_keys": len(got),
        "n_micro_batches": n_batches,
        "batch_query": "events groupBy user_id count",
    }


def check_stream_stream_interval_join(spark, tmp):
    """Stream-stream watermarked interval join (VERDICT r17 #2): two
    event streams (the events table split by even/odd event_id, each
    replayed time-ordered) joined on user_id with r_ts BETWEEN l_ts AND
    l_ts + 5 min — the q21 batch shape. Two assertions:

    1. equivalence: after processAllAvailable the memory sink's pair set
       equals the batch interval join of the two halves exactly;
    2. late-row drop: on a hand-built two-batch feed, a matching pair
       delivered BELOW the watermark (batch 1 advanced both sides to
       T0+3h -> watermark T0+2h; batch 2 delivers a pair at T0+10min)
       is dropped, while the on-time batch-1 pair is emitted."""
    import datetime as dt

    from hadoop_copier_spark.streaming import (
        EVENTS_SCHEMA,
        replay_events_split,
        stream_interval_join,
    )
    from hadoop_copier_spark.tables import load_table

    # -- 1. equivalence over the replayed even/odd split --------------
    left_dir, right_dir = replay_events_split(
        spark, SF, os.path.join(tmp, "replay_ssj2"), n_chunks=3
    )
    q = stream_interval_join(spark, left_dir, right_dir, "rec_ssj2")
    try:
        q.processAllAvailable()
        n_batches = int((q.lastProgress or {}).get("batchId", -2)) + 1
        got = {
            (r["l_id"], r["r_id"])
            for r in spark.sql("SELECT * FROM rec_ssj2").collect()
        }
    finally:
        q.stop()
    e = load_table(spark, SF, "events")
    left = e.filter(F.col("event_id") % 2 == 0).select(
        F.col("event_id").alias("l_id"),
        F.col("user_id").alias("l_user"),
        F.col("ts").alias("l_ts"),
    )
    right = e.filter(F.col("event_id") % 2 != 0).select(
        F.col("event_id").alias("r_id"),
        F.col("user_id").alias("r_user"),
        F.col("ts").alias("r_ts"),
    )
    batch = {
        (r["l_id"], r["r_id"])
        for r in left.join(
            right,
            (F.col("l_user") == F.col("r_user"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 5 MINUTES")),
            "inner",
        ).collect()
    }
    equals_batch = got == batch and len(batch) > 0

    # -- 2. late-row drop ---------------------------------------------
    late_l = os.path.join(tmp, "ssj_late_l")
    late_r = os.path.join(tmp, "ssj_late_r")
    t0 = dt.datetime(2024, 6, 1, 10, 0, 0)

    def mk(rows, d, sub):
        spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), schema=EVENTS_SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, sub))

    # batch 1: on-time pair (2,3) for user 5 + T0+3h advancers both sides
    mk([(2, t0, 5, "click", 1.0, "{}"),
        (4, t0 + dt.timedelta(hours=3), 99, "click", 1.0, "{}")], late_l, "b1")
    mk([(3, t0 + dt.timedelta(minutes=2), 5, "click", 1.0, "{}"),
        (5, t0 + dt.timedelta(hours=3), 98, "click", 1.0, "{}")], late_r, "b1")
    q2 = stream_interval_join(spark, late_l, late_r, "rec_ssj2_late")
    try:
        q2.processAllAvailable()
        # batch 2: matching pair at T0+10/12 min — below the T0+2h watermark
        mk([(6, t0 + dt.timedelta(minutes=10), 7, "click", 1.0, "{}")], late_l, "b2")
        mk([(7, t0 + dt.timedelta(minutes=12), 7, "click", 1.0, "{}")], late_r, "b2")
        q2.processAllAvailable()
        late_pairs = {
            (r["l_id"], r["r_id"])
            for r in spark.sql("SELECT * FROM rec_ssj2_late").collect()
        }
    finally:
        q2.stop()
    ontime_emitted = (2, 3) in late_pairs
    late_dropped = (6, 7) not in late_pairs

    return {
        "stream_equals_batch": equals_batch,
        "n_pairs": len(got),
        "n_micro_batches": n_batches,
        "batch_query": "q21 shape: even(events) x odd(events) ON user_id, "
        "r_ts BETWEEN l_ts AND l_ts + 5 min",
        "ontime_pair_emitted": ontime_emitted,
        "late_pair_dropped": late_dropped,
        "pass": equals_batch and ontime_emitted and late_dropped,
    }


CHECKS = [
    ("tumbling_window_q61", check_tumbling_equals_batch),
    ("sliding_window_q62", check_sliding_equals_batch),
    ("session_window_q63", check_session_equals_batch),
    ("streaming_dedup", check_streaming_dedup),
    ("watermark_late_drop", check_watermark_drops_late),
    ("exactly_once_foreachbatch_restart", check_exactly_once_foreachbatch),
    ("exactly_once_file_sink_midstream_restart",
     check_exactly_once_file_sink_midstream_restart),
    ("failed_batch_midwrite_restart", check_failed_batch_midwrite_restart),
    ("stateful_subseq_matcher", check_subseq_matcher_equals_batch),
    ("streaming_hll_merge", check_streaming_hll_merge),
    ("streaming_cms_merge", check_streaming_cms_merge),
    ("streaming_mg_recount", check_streaming_mg_recount),
    ("stream_static_join", check_stream_static_join),
    ("stateful_per_key_counts", check_stateful_per_key_counts),
    ("stream_stream_interval_join", check_stream_stream_interval_join),
]


def main() -> None:
    from hadoop_copier_spark.session import get_spark

    spark = get_spark()
    tmp = tempfile.mkdtemp(prefix="streaming_rec_")
    checks = {}
    try:
        for name, fn in CHECKS:
            try:
                r = fn(spark, tmp)
                if "pass" not in r:
                    r["pass"] = bool(r.get("stream_equals_batch"))
            except Exception as ex:  # noqa: BLE001 - recording, not raising
                r = {"pass": False, "error": str(ex).splitlines()[0][:200]}
            checks[name] = r
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out = {
        "meta": {
            "round": ROUND,
            "sf_dir": SF,
            "n_checks": len(checks),
            "n_pass": sum(1 for v in checks.values() if v["pass"]),
            "loadavg_1m_5m_15m": [round(x, 2) for x in os.getloadavg()],
            "note": "explicit micro-batches (append files + "
            "processAllAvailable), never wall-clock; same logic as "
            "tests/test_streaming.py",
        },
        "checks": checks,
    }
    path = os.path.join(_REPO, f"STREAMING_r{ROUND}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"wrote": path, **out["meta"]}))


if __name__ == "__main__":
    main()
