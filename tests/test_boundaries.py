"""Exact-boundary semantics, pinned on micro-fixtures (the q63 failure
class: an engine-boundary rule that no SF fixture happens to exercise
stays silently untested). Each case builds the smallest data that sits ON
the boundary and asserts which side of it each operator lands."""

import datetime as dt

from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(seconds):
    return BASE + dt.timedelta(seconds=seconds)


def test_tumbling_window_boundary_event_starts_new_window(spark):
    """An event at exactly the window edge (t = k*width) belongs to the
    NEW window — window() floors, end-exclusive: [start, end)."""
    df = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(599)), (3, _ts(600))], "id long, ts timestamp"
    )
    rows = (
        df.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .orderBy("w.start")
        .collect()
    )
    assert [r["ids"] for r in rows] == [[1, 2], [3]]


def test_session_window_exact_gap_merges(spark):
    """An event at exactly prev_ts + gap MERGES (inclusive merge test) —
    the rule the q63 oracle got wrong until the sf0.1 sweep caught it."""
    df = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(1800)), (3, _ts(3601))], "id long, ts timestamp"
    )
    rows = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("w.start")
        .collect()
    )
    # 0 and 1800 merge (exact gap); 3601 is 1801 s after 1800 -> new session
    assert [r["n"] for r in rows] == [2, 1]


def test_range_join_between_includes_both_endpoints(spark):
    """BETWEEN is closed on both ends in Spark SQL and ANSI SQL alike; a
    range-join predicate keeps rows sitting exactly on either bound."""
    left = spark.createDataFrame([(1, 10), (2, 20)], "lid long, v long")
    right = spark.createDataFrame([(100, 10, 20)], "rid long, lo long, hi long")
    rows = (
        left.join(right, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi")))
        .select("lid")
        .orderBy("lid")
        .collect()
    )
    assert [r["lid"] for r in rows] == [1, 2]


def test_asof_join_candidate_at_exact_time_is_taken(spark):
    """asof_join is at-or-BEFORE: a right row timestamped exactly at the
    left row's time must be selected over an earlier one."""
    from hadoop_copier_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, "k", _ts(100))], "lid long, k string, lt timestamp")
    right = spark.createDataFrame(
        [(10, "k", _ts(50)), (11, "k", _ts(100)), (12, "k", _ts(101))],
        "rid long, k string, rt timestamp",
    )
    rows = asof_join(left, right, "k", "lt", "rt").select("lid", "rid").collect()
    assert [(r["lid"], r["rid"]) for r in rows] == [(1, 11)]


def test_watermark_boundary_event_at_exact_watermark_kept(spark, tmp_path):
    """Windowed agg drops data strictly OLDER than the watermark; a window
    whose end equals the current watermark is still finalized correctly
    (no premature drop of the boundary window)."""
    import os

    from hadoop_copier_spark.streaming import EVENTS_SCHEMA

    src = str(tmp_path / "wm_src")

    def mk(rows, sub):
        df = spark.createDataFrame(rows, schema=EVENTS_SCHEMA)
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, sub))

    mk([(1, _ts(0), 7, "click", 1.0, "{}")], "b1")
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
        .select(F.unix_timestamp("w.start").alias("w0"), "n")
    )
    q = agg.writeStream.outputMode("append").format("memory").queryName("t_wmb").start()
    try:
        q.processAllAvailable()
        # advance watermark to exactly the first window's end + delay:
        # event at t=1200 -> watermark 1200-600=600 == window [0,600) end
        mk([(2, _ts(1200), 7, "click", 1.0, "{}")], "b2")
        q.processAllAvailable()
        # one more nudge well past, to flush anything pending
        mk([(3, _ts(4000), 7, "click", 1.0, "{}")], "b3")
        q.processAllAvailable()
        got = {r["w0"]: r["n"] for r in spark.sql("SELECT * FROM t_wmb").collect()}
    finally:
        q.stop()
    w0 = int(BASE.replace(tzinfo=dt.timezone.utc).timestamp())
    assert got.get(w0) == 1
