"""Windowed event-time aggregations, batch form (SURVEY §2b Q61-Q63).

These are the hash-checked batch equivalents of the Structured-Streaming
operators; hadoop_copier_spark.streaming runs the same logic as actual
streams and tests assert stream == batch (SURVEY §5.2 item 3).

Window starts are compared as epoch seconds (BIGINT) — Spark's window()
aligns to the unix epoch, and emitting epoch ints sidesteps engine
timezone-rendering differences entirely.
"""

from __future__ import annotations

from .base import F, cents_sum, ocents_sum, tbl
from .registry import register


@register(
    "q61",
    oracle=f"""SELECT CAST(floor(epoch(ts) / 600) AS BIGINT) * 600 AS w_start_sec,
                     event_type, COUNT(*) AS n,
                     {ocents_sum('value')} AS sum_val_cents
              FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    tags=("streaming", "window"),
)
def q61(spark, sf_dir):
    """Tumbling 10-minute window aggregate (batch form of the streaming
    query; window() is epoch-aligned in both engines). Value sum in BIGINT
    cents (integer-units rule)."""
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            cents_sum("value", "sum_val_cents"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("w_start_sec"),
            "event_type",
            "n",
            "sum_val_cents",
        )
        .orderBy("w_start_sec", "event_type")
    )


@register(
    "q62",
    oracle=f"""SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 - u.k AS w_start_sec,
                     COUNT(*) AS n,
                     {ocents_sum('value')} AS sum_val_cents
              FROM events, (SELECT unnest([0, 300]) AS k) u
              GROUP BY 1 ORDER BY 1""",
    tags=("streaming", "window"),
)
def q62(spark, sf_dir):
    """Sliding window (10-minute length, 5-minute slide): every event falls
    in exactly two windows; the oracle enumerates both starts per event.
    Value sum in BIGINT cents (integer-units rule)."""
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            cents_sum("value", "sum_val_cents"),
        )
        .select(F.unix_timestamp(F.col("w.start")).alias("w_start_sec"), "n", "sum_val_cents")
        .orderBy("w_start_sec")
    )


@register(
    "q63",
    oracle="""WITH x AS (
                SELECT user_id, event_id,
                       CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS e
                FROM events),
              y AS (
                SELECT *, lag(e) OVER (PARTITION BY user_id ORDER BY e, event_id) AS prev
                FROM x),
              z AS (
                SELECT *, SUM(CASE WHEN prev IS NULL OR e - prev > 1800 THEN 1 ELSE 0 END)
                          OVER (PARTITION BY user_id ORDER BY e, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
                FROM y)
              SELECT user_id,
                     MIN(e) AS session_start_sec,
                     MAX(e) + 1800 AS session_end_sec,
                     COUNT(*) AS n_events
              FROM z GROUP BY user_id, sid
              ORDER BY user_id, session_start_sec""",
    tags=("streaming", "session"),
)
def q63(spark, sf_dir):
    """Session windows (30-minute gap) in batch via session_window(); the
    oracle is the gaps-and-islands formulation. Gap semantics (verified
    empirically against session_window): an event at EXACTLY prev_ts +
    30min still MERGES into the session (Spark's session end is
    inclusive for the merge test) — so the island break is e - prev >
    1800, not >=. The >= spelling passed at sf0.01 (no exact-gap pair
    exists there) and broke at sf0.1: boundary semantics need a fixture
    that actually contains the boundary. ts second-truncated on both
    sides (rule 3)."""
    e = tbl(spark, sf_dir, "events").withColumn("ts_s", F.date_trunc("second", F.col("ts")))
    return (
        e.groupBy(F.session_window("ts_s", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start_sec"),
            F.unix_timestamp(F.col("w.end")).alias("session_end_sec"),
            "n_events",
        )
        .orderBy("user_id", "session_start_sec")
    )


@register(
    "xh_rollup_cascade",
    oracle=f"""SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS h_start_sec,
                     event_type, COUNT(*) AS n,
                     {ocents_sum('value')} AS sum_val_cents
              FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    tags=("streaming", "window", "rollup", "scale-variant"),
)
def xh_rollup_cascade(spark, sf_dir):
    """Hierarchical time rollup (the hypertable / continuous-aggregate
    pattern): hour-level aggregates derived FROM the minute-level partial
    aggregates, not from raw events. The oracle aggregates raw events
    straight to hours, so the hash match proves the cascade is lossless —
    COUNT and exact BIGINT cent sums re-aggregate exactly (which is the
    reason the engine's windowed aggregates emit sums/counts rather than
    averages: averages don't cascade, sum/count pairs do).

    At 100 TB this is the load-bearing shape: the minute level is ~1/600th
    of the raw rows, so every coarser resolution (hour/day/month) reads
    the materialized finer level instead of rescanning the corpus — the
    second aggregation's input is already tiny and both aggregations are
    partial->final on (bucket, type) keys."""
    e = tbl(spark, sf_dir, "events")
    minutes = (
        e.groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            cents_sum("value", "sum_val_cents"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("m_start_sec"),
            "event_type",
            "n",
            "sum_val_cents",
        )
    )
    return (
        minutes.withColumn(
            "h_start_sec", (F.col("m_start_sec") - F.col("m_start_sec") % 3600)
        )
        .groupBy("h_start_sec", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_val_cents").alias("sum_val_cents"),
        )
        .orderBy("h_start_sec", "event_type")
    )
