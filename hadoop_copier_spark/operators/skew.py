"""Skew-aware join (SURVEY §7.3 '100 TB design discipline': salting
pattern, documented and implemented).

AQE's skew-join split (on by default in the session factory) handles most
skew at runtime; ``salted_join`` is the explicit fallback for joins AQE
cannot split (e.g. a shuffled aggregation feeding the join, or pre-AQE
engines): the hot side's key is extended with a random-ish salt in
[0, n_salts), and the small side is replicated across every salt value, so
one hot key spreads over n_salts reducer partitions.

Salt derivation uses a hash of a unique column (not rand()) so results are
deterministic and retry-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join big⋈small on ``key`` with the big side salted.

    ``salt_source``: a big-side column whose per-row hash spreads the hot
    key — ideally a unique id. Default: xxhash64 over ALL big-side columns,
    which is row-content-derived, so it is deterministic, retry-safe, and
    independent of physical partitioning (a partition-id salt would give
    every row of an input partition the same salt — a hot key concentrated
    in few input partitions would still land on few reducers, and partition
    ids shift under AQE/repartitioning)."""
    if salt_source:
        src_cols = [F.col(salt_source)]
    else:
        src_cols = [F.col(c) for c in big.columns]
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*src_cols, F.lit(17)), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    small_r = small.select("*", salts)
    out = big_s.join(small_r, [key, "__salt"], how)
    return out.drop("__salt")
