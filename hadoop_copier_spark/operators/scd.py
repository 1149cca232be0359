"""SCD Type-2 compaction: change-event capture over an append-only log.

Given an append-only attribute log (key, attr, time) — the shape of a CDC
feed or the `events` table — produce the slowly-changing-dimension type-2
history: one row per (key, run of identical attr values), with
[effective_from, effective_to) validity and a per-key version number.
Consecutive duplicates collapse; `effective_to` is NULL on the open
(current) version.

This is the standard warehouse versioning operator the reference engine's
users would reach for when landing copied data into a dimension table; the
reference itself has no transform surface (it copies bytes), so the
operator derives from SURVEY §2b's window-function contract, not from a
reference file.

Scale shape: two window passes over the SAME (key)-partitioning — Catalyst
plans ONE hash Exchange; the second window reuses the partitioning and
ordering of the first (the filter between them preserves both). No
driver-side state, no join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_compact"]


def scd2_compact(
    df: DataFrame,
    key: str,
    attr: str,
    time: str,
    tiebreak: str,
) -> DataFrame:
    """Collapse an attribute log into SCD2 versions.

    ``tiebreak`` makes the ordering total when two log rows share a
    timestamp (required for a deterministic, hash-checkable result).

    Returns (key, attr, effective_from, effective_to, version) with
    version numbering 1..n per key in time order.
    """
    w = Window.partitionBy(key).orderBy(time, tiebreak)
    changes = (
        df.select(key, attr, time, tiebreak)
        .withColumn("__prev", F.lag(attr).over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col(attr)))
    )
    w2 = Window.partitionBy(key).orderBy(time, tiebreak)
    return (
        changes.select(
            key,
            attr,
            F.col(time).alias("effective_from"),
            F.lead(time).over(w2).alias("effective_to"),
            F.row_number().over(w2).alias("version"),
        )
    )
