"""As-of join (SURVEY §2b Q22): for each left row, the single most recent
right row with right.time <= left.time, matching DuckDB ASOF JOIN semantics
(inclusive bound) plus an explicit deterministic tiebreak DuckDB lacks.

Spark has no native as-of join, so this composes built-ins:
equi-join on the key + time-range predicate, then a row_number window
keeping the latest candidate. Catalyst plans the join as broadcast or
sort-merge depending on side sizes; the window adds one shuffle on the
left row id.

At 100 TB: if the right side is a large history table, pre-bucket both
sides on the key (``df.write.bucketBy(n, key)``) so the join is
shuffle-free, and bound the candidate window with an additional
``right.time >= left.time - INTERVAL x`` predicate to cap fan-out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] | Column,
    left_time: str,
    right_time: str,
    tiebreak: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each left row to the latest right row at-or-before its time.

    ``tiebreak``: right-side column deciding among equal-time candidates
    (highest wins) — makes the result deterministic where DuckDB's ASOF
    would be free to pick either.
    """
    lid = "__asof_left_id"
    lt = F.col(f"__l.{left_time}")
    rt = F.col(f"__r.{right_time}")
    lhs = left.alias("__l").withColumn(lid, F.monotonically_increasing_id())
    rhs = right.alias("__r")

    if isinstance(on, Column):
        cond = on & (rt <= lt)
    else:
        keys = [on] if isinstance(on, str) else list(on)
        cond = rt <= lt
        for k in keys:
            cond = (F.col(f"__l.{k}") == F.col(f"__r.{k}")) & cond

    order = [rt.desc()]
    if tiebreak:
        order.append(F.col(f"__r.{tiebreak}").desc())
    w = Window.partitionBy(lid).orderBy(*order)

    joined = lhs.join(rhs, cond, how).withColumn("__rn", F.row_number().over(w))
    out = joined.filter(F.col("__rn") == 1).drop("__rn", lid)
    if not isinstance(on, Column):
        # equi keys exist on both sides with equal values — keep the left copy
        for k in [on] if isinstance(on, str) else list(on):
            out = out.drop(F.col(f"__r.{k}"))
    return out
