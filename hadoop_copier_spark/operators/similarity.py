"""Embedding similarity search operators (SURVEY §2b Q59 + P extensions).

Two paths:
- ``cosine_topk`` — brute-force cosine top-k, expression-only (zip_with +
  aggregate higher-order functions, JVM-side, no Python). The query side is
  broadcast; the candidate scan streams — O(|C| * |Q| * dim) work fully
  parallel with no shuffle except the final per-query top-k window.
- ``lsh_ann_topk`` — random-hyperplane (sign) LSH bucketing for the 100 TB
  path: candidates are only compared inside matching buckets, trading exact
  recall for a ~buckets-fold work reduction. Hyperplanes are generated from
  a fixed seed on the driver and broadcast as literals, so results are
  deterministic.

Determinism: dot products and norms accumulate as DECIMAL(30,18) (exact,
order-independent); the cosine itself is then a fixed sequence of IEEE ops,
so scores are bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(30,18)"


def dec_dot(a: Column, b: Column) -> Column:
    """Exact decimal dot product of two float-array columns."""
    prods = F.zip_with(a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(_DEC))
    return F.aggregate(prods, F.lit(0).cast(_DEC), lambda acc, v: (acc + v).cast(_DEC))


def dec_norm2(a: Column) -> Column:
    """Exact decimal squared L2 norm of a float-array column."""
    return dec_dot(a, a)


def cosine_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors per query vector (self-matches excluded).

    Returns (query_id, neighbor_id, rank, score DECIMAL(18,6)).
    """
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        dec_norm2(F.col(vec_col)).alias("__cn2"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        dec_norm2(F.col(vec_col)).alias("__qn2"),
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col("query_id"))
    cos = (
        dec_dot(F.col("__qvec"), F.col("__cvec")).cast("double")
        / F.sqrt(F.col("__qn2").cast("double") * F.col("__cn2").cast("double"))
    )
    scored = pairs.select("query_id", "neighbor_id", cos.alias("__cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.col("__cos").cast("decimal(18,6)").alias("score"),
        )
    )


def lsh_ann_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_tables: int = 8,
    planes_per_table: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH.

    L independent hash tables of r hyperplane-sign bits each; a pair is a
    candidate if it collides in ANY table (recall ~ 1-(1-p^r)^L where p is
    the per-plane sign-agreement probability). Only candidates are scored.

    At 100 TB: rows explode into L (table, bucket) keys and shuffle once on
    that key; each bucket's comparisons are node-local, and the per-query
    top-k merges k rows per bucket — never the full candidate set.
    """
    import random

    rng = random.Random(seed)
    tables = [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(planes_per_table)]
        for _ in range(n_tables)
    ]

    def _dbl_dot(a: Column, p: list) -> Column:
        # plain double dot for bucketing: fixed evaluation order => Spark-
        # internally deterministic, and ~10x cheaper than the decimal path
        # (bucket boundaries don't need cross-engine exactness).
        prods = F.zip_with(a, F.array(*[F.lit(w) for w in p]), lambda x, y: x.cast("double") * y)
        return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)

    def bucket_keys(vec: Column) -> Column:
        """Array of L structs (table_id, bucket bit-pattern)."""
        keys = []
        for t, planes in enumerate(tables):
            bits = [
                F.when(_dbl_dot(vec, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
                for i, p in enumerate(planes)
            ]
            code = bits[0]
            for b in bits[1:]:
                code = code + b
            keys.append(F.struct(F.lit(t).alias("t"), code.alias("code")))
        return F.array(*keys)

    def _dbl_dot2(a: Column, b: Column) -> Column:
        prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
        return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)

    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        _dbl_dot2(F.col(vec_col), F.col(vec_col)).alias("__cn2"),
        F.explode(bucket_keys(F.col(vec_col))).alias("__bk"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        _dbl_dot2(F.col(vec_col), F.col(vec_col)).alias("__qn2"),
        F.explode(bucket_keys(F.col(vec_col))).alias("__qbk"),
    )
    pairs = (
        c.join(
            F.broadcast(q),
            (F.col("__bk") == F.col("__qbk")) & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "neighbor_id", "__qvec", "__cvec", "__qn2", "__cn2")
        .distinct()  # a pair may collide in several tables
    )
    # double cosine: array-order evaluation => deterministic within Spark;
    # cross-engine exactness is not required for the approximate path.
    cos = _dbl_dot2(F.col("__qvec"), F.col("__cvec")) / F.sqrt(F.col("__qn2") * F.col("__cn2"))
    w = Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), F.col("neighbor_id"))
    return (
        pairs.select("query_id", "neighbor_id", cos.alias("__cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.col("__cos").cast("decimal(18,6)").alias("score"))
    )
