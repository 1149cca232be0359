"""Binned range joins — the scale-path replacements for BNLJ theta joins.

Spark plans a non-equi join with no equi component as a broadcast nested
loop (or cartesian) join: every right partition is compared against every
left row. Fine for a 100-row dimension (q20), fatal at 100 TB. The classic
fix (the "band join" of the join literature) is to discretize the join
axis into fixed-width bins so the range predicate becomes an EQUI join on
the bin id plus a residual filter:

    left interval [lo, hi]   ->  bins floor(lo/w) .. floor(hi/w)  (exploded)
    right point    x         ->  bin  floor(x/w)                  (computed)
    join on (keys..., bin), then re-check the exact predicate.

Each (left, right) pair meets in EXACTLY one bin (the right row's bin), so
no post-join dedup is needed. The join shuffles both sides once on
(keys..., bin) and runs as a shuffle-hash/sort-merge join — per-partition
work is bounded by bin population, not table size. Bin width trades
candidate fan-out (wide bins) against explode factor (narrow bins); a
width equal to the interval length gives <= 2 bins per left row.

The axis must be integral (exact bin arithmetic): callers convert
timestamps via unix_millis and 2-dp money via the exact cents
reconstruction (queries/base.py `cents`) before binning.

Reference parity note: the reference engine (neva-layna/hadoop-copier) has
no join surface at all — this operator exists for the analytics contract
(SURVEY §2b Q20/Q21) and its 100 TB scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["binned_range_join"]


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_lo: str,
    left_hi: str,
    right_axis: str,
    bin_width: int,
    residual: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-ized range join: left interval [left_lo, left_hi] (inclusive)
    against right point ``right_axis`` — all three INTEGRAL COLUMNS already
    present on their frames (names, not expressions: the join below is a
    self-join in the q21/q23 uses, and alias-qualified names survive
    Spark's self-join exprId dedup where captured Column objects become
    ambiguous).

    ``keys`` are additional equi-join keys (may be empty — then the bin id
    is the ONLY join key, which is exactly what makes a keyless band join
    scale: it still hash-partitions instead of nested-looping).

    ``residual`` is the exact predicate re-checked after the bin join,
    referencing columns through the ``__l`` / ``__r`` aliases; default
    ``__l.left_lo <= __r.right_axis <= __l.left_hi``. Pass the full
    original condition when it has extra terms (e.g. q21's id inequality).

    Returns the joined frame aliased ``__l`` / ``__r``; callers project
    with qualified names.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be a positive integer")
    lbin, rbin = "__range_bin_l", "__range_bin"
    w = F.lit(int(bin_width)).cast("long")
    lhs = left.withColumn(
        lbin,
        F.explode(
            F.sequence(
                F.floor(F.col(left_lo).cast("long") / w).cast("long"),
                F.floor(F.col(left_hi).cast("long") / w).cast("long"),
            )
        ),
    ).alias("__l")
    rhs = right.withColumn(
        rbin, F.floor(F.col(right_axis).cast("long") / w).cast("long")
    ).alias("__r")

    cond = F.col(f"__l.{lbin}") == F.col(f"__r.{rbin}")
    for k in keys:
        cond = (F.col(f"__l.{k}") == F.col(f"__r.{k}")) & cond
    if residual is None:
        residual = F.col(f"__r.{right_axis}").between(
            F.col(f"__l.{left_lo}"), F.col(f"__l.{left_hi}")
        )
    return lhs.join(rhs, cond, how).filter(residual).drop(lbin, rbin)
