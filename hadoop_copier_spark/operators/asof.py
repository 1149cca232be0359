"""As-of join (SURVEY §2b Q22): for each left row, the single most recent
right row with right.time <= left.time, matching DuckDB ASOF JOIN semantics
(inclusive bound) plus an explicit deterministic tiebreak DuckDB lacks.

Spark has no native as-of join, so this composes built-ins:
equi-join on the key + time-range predicate, then a per-left-row
``max_by`` hash aggregation keeping the latest candidate. The aggregation
form beats the row_number-window form at scale: it partially aggregates
map-side (each shuffle partition sends at most one candidate per left row)
and never sorts candidate groups.

At 100 TB: if the right side is a large history table, pre-bucket both
sides on the key (``df.write.bucketBy(n, key)``) so the join is
shuffle-free, and bound candidates with ``lookback`` +
``bucket_width`` — the (key, time-bucket) equi pre-join below — so
candidate volume AND shuffle-key cardinality stay bounded as history
accumulates.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC_TYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double",
}


def _time_as_seconds(col: Column, dtype: str) -> Column:
    """Numeric image of a time axis for bucket arithmetic: numerics pass
    through, timestamp/date become epoch seconds (date via timestamp so
    the cast chain is legal for both)."""
    base = dtype.split("(")[0]
    if base in _NUMERIC_TYPES or base == "decimal":
        return col.cast("double")
    return col.cast("timestamp").cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] | Column,
    left_time: str,
    right_time: str,
    tiebreak: str | None = None,
    how: str = "inner",
    lookback: Column | None = None,
    bucket_width: float | None = None,
    lookback_seconds: float | None = None,
) -> DataFrame:
    """Join each left row to the latest right row at-or-before its time.

    ``tiebreak``: right-side column deciding among equal-time candidates
    (highest wins) — makes the result deterministic where DuckDB's ASOF
    would be free to pick either.

    ``how``: 'inner' drops left rows with no match; 'left' keeps them with
    a null right side.

    ``lookback``: optional window bound — candidates must also satisfy
    ``right.time >= left.time - lookback`` (e.g. ``F.expr("INTERVAL 1
    DAY")`` for timestamps, or a numeric Column for numeric time axes).
    This is the 100 TB fan-out cap: without it, a key's EVERY historical
    right row is a candidate for every left row (the join blows up as
    history accumulates); with it, candidate volume is bounded per left
    row regardless of history depth. Semantics change only for matches
    older than the window — choose it from data staleness rules.

    ``bucket_width``: optional (key, time-bucket) equi pre-join (VERDICT
    r8 #6), in SECONDS for timestamp/date axes and raw units for numeric
    ones. Requires ``lookback`` AND ``lookback_seconds``. Both sides get
    a bucket id floor(time / width); the left side is exploded over the
    ``ceil(lookback_seconds / bucket_width) + 1`` consecutive bucket ids
    that can contain a candidate in [t - lookback, t], and the bucket
    joins as an ADDITIONAL EQUI KEY. A right row's single bucket id
    matches at most one of the exploded left copies, so no candidate
    duplicates. This changes the shuffle key from (key) to (key, bucket):
    a hot key's unbounded history now spreads across time buckets instead
    of converging on one reducer, and the residual time predicates filter
    within a bounded candidate set instead of all history.
    Result-identical to the unbucketed lookback form for ANY positive
    width (pinned in tests/test_boundaries.py / tests/test_properties.py
    / tests/test_plans.py). Choose width ~= the lookback for the minimal
    2-copy explode; smaller widths trade left-side fan-out for finer
    history spreading.

    ``lookback_seconds``: the MAXIMUM realization of ``lookback`` in the
    time axis's numeric-image units (epoch seconds for timestamp/date
    axes — the session timezone is assumed UTC; raw units for numeric
    axes). Required with ``bucket_width`` because calendar intervals have
    no fixed width: INTERVAL 1 MONTH spans 28-31 days, so its maximum
    realization is 31*86400; INTERVAL 40 YEAR is at most 14610 days. An
    under-stated value silently drops boundary matches — always round UP.
    """
    if bucket_width is not None:
        if lookback is None:
            raise ValueError("bucket_width requires lookback (it relies on the "
                             "candidate interval being at most lookback wide)")
        if bucket_width <= 0:
            raise ValueError("bucket_width must be positive")
        if lookback_seconds is None:
            raise ValueError(
                "bucket_width requires lookback_seconds — the MAXIMUM "
                "realization of lookback in the time axis's numeric units "
                "(e.g. 31*86400 for INTERVAL 1 MONTH). It sizes the left-side "
                "bucket explode; without it a width narrower than the "
                "lookback would silently drop matches."
            )
        if lookback_seconds <= 0:
            raise ValueError("lookback_seconds must be positive")
        n_buckets = math.ceil(lookback_seconds / bucket_width) + 1
        if n_buckets > 64:
            raise ValueError(
                f"bucket_width={bucket_width} needs {n_buckets} exploded left "
                f"copies to cover lookback_seconds={lookback_seconds}; cap is "
                "64 — widen bucket_width (width ~= lookback gives the minimal "
                "2 copies)"
            )
    lid = "__asof_left_id"
    lt = F.col(f"__l.{left_time}")
    rt = F.col(f"__r.{right_time}")
    lhs = left.alias("__l").withColumn(lid, F.monotonically_increasing_id())
    rhs = right.alias("__r")

    equi_keys: list[str] = []
    if isinstance(on, Column):
        cond = on & (rt <= lt)
    else:
        equi_keys = [on] if isinstance(on, str) else list(on)
        cond = rt <= lt
        for k in equi_keys:
            cond = (F.col(f"__l.{k}") == F.col(f"__r.{k}")) & cond
    if lookback is not None:
        cond = cond & (rt >= lt - lookback)
    if bucket_width is not None:
        ldt = dict(left.dtypes)[left_time]
        rdt = dict(right.dtypes)[right_time]
        lb = F.floor(_time_as_seconds(lt, ldt) / F.lit(float(bucket_width)))
        rb = F.floor(_time_as_seconds(rt, rdt) / F.lit(float(bucket_width)))
        lhs = lhs.withColumn(
            "__asof_bucket_l",
            F.explode(F.array(*[lb - F.lit(i) for i in range(n_buckets)])),
        )
        rhs = rhs.withColumn("__asof_bucket_r", rb)
        cond = (F.col("__asof_bucket_l") == F.col("__asof_bucket_r")) & cond

    right_out = [c for c in right.columns if c not in equi_keys]
    # ordering key for max_by: (right_time, tiebreak) as a struct — null
    # keys (unmatched left rows under how='left') are ignored by max_by
    ordkey = F.struct(rt.alias("t"), (F.col(f"__r.{tiebreak}") if tiebreak else rt).alias("b"))
    best = F.max_by(F.struct(*[F.col(f"__r.{c}").alias(c) for c in right_out]), ordkey)

    joined = lhs.join(rhs, cond, how)
    agg = joined.groupBy(lid).agg(
        *[F.first(F.col(f"__l.{c}")).alias(c) for c in left.columns],
        best.alias("__best"),
    )
    return agg.select(
        *left.columns, *[F.col(f"__best.{c}").alias(c) for c in right_out]
    )
