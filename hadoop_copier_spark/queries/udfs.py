"""UDF / UDAF / UDTF surface (SURVEY §2b Q64-Q67 + UDTF extra).

Q64 is the only row-at-a-time Python UDF in the engine (deliberately, on
the 25-row nation table — the slow path exists to prove the surface, not
to run hot). Everything else is Arrow-vectorized (pandas_udf /
applyInPandas) or a Python UDTF.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

from .base import tbl
from .registry import register

# Shared by q67 (pandas path) and h_znorm_window (JVM path): per-user
# z-normalization over exact int64 cents. Mean/variance come from exact
# integer window sums and a fixed IEEE op sequence — every implementation
# (DuckDB, Spark window, numpy) mirrors this tree token-for-token, so the
# emitted doubles are bit-identical (no version-sensitive decimal casts).
_ZNORM_ORACLE = """
WITH b AS (
  SELECT event_id, user_id, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc FROM events
),
w AS (
  SELECT event_id, user_id, vc,
         CAST(SUM(vc) OVER pw AS DOUBLE) AS s,
         CAST(SUM(vc * vc) OVER pw AS DOUBLE) AS q,
         COUNT(vc) OVER pw AS n
  FROM b WINDOW pw AS (PARTITION BY user_id)
)
SELECT event_id, user_id,
       CASE WHEN n > 1 AND (q - s * s / n) / (n - 1) > 0
            THEN (CAST(vc AS DOUBLE) - s / n) / sqrt((q - s * s / n) / (n - 1))
            ELSE NULL END AS znorm
FROM w ORDER BY event_id
"""


@register(
    "q64",
    oracle="SELECT n_nationkey, reverse(n_name) AS rev_name FROM nation ORDER BY n_nationkey",
    tags=("udf",),
)
def q64(spark, sf_dir):
    """Python scalar UDF (row-at-a-time) reversing a string; oracle is the
    built-in reverse()."""
    rev = F.udf(lambda s: s[::-1] if s is not None else None, T.StringType())
    n = tbl(spark, sf_dir, "nation")
    return n.select("n_nationkey", rev("n_name").alias("rev_name")).orderBy("n_nationkey")


@register(
    "q65",
    oracle="""SELECT l_orderkey, l_linenumber,
                     l_extendedprice * (1 - l_discount) AS net
              FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    tags=("udf", "pandas"),
)
def q65(spark, sf_dir):
    """Vectorized (Arrow) scalar pandas UDF computing x*(1-d) — numpy
    elementwise IEEE ops match the oracle's per-row arithmetic bit-for-bit."""

    @F.pandas_udf(T.DoubleType())
    def net_udf(x: pd.Series, d: pd.Series) -> pd.Series:
        return x * (1 - d)

    li = tbl(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_udf(F.col("l_extendedprice"), F.col("l_discount")).alias("net"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "q66",
    oracle="""SELECT l_returnflag,
                     CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                              * CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                          / CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                          / 100.0 AS wavg_price
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    tags=("udf", "udaf"),
)
def q66(spark, sf_dir):
    """Grouped-agg pandas UDF (UDAF): quantity-weighted average price.

    Exactness argument: prices and quantities are exact 2-dp values, so
    FLOOR(x*100+0.5) recovers exact int64 cents (the same single IEEE ops
    numpy applies elementwise); cent products and their group sums stay
    below 2^63, so the integer arithmetic is EXACT and order-independent —
    the two final divisions mirror the oracle's op tree bit-for-bit.
    """
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def wavg(p: pd.Series, q: pd.Series) -> float:
        pc = np.floor(p.to_numpy(dtype="float64") * 100 + 0.5).astype("int64")
        qc = np.floor(q.to_numpy(dtype="float64") * 100 + 0.5).astype("int64")
        return float(int((pc * qc).sum())) / float(int(qc.sum())) / 100.0

    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(wavg(F.col("l_extendedprice"), F.col("l_quantity")).alias("wavg_price"))
        .orderBy("l_returnflag")
    )


@register(
    "q67",
    oracle=_ZNORM_ORACLE,
    tags=("udf", "groupedmap"),
)
def q67(spark, sf_dir):
    """Grouped-map applyInPandas: per-user z-normalization of event values.

    Bit-exact vs the oracle: values quantized to exact int64 cents (same
    FLOOR op), mean/variance derived from exact integer sums with the
    identical IEEE op sequence the oracle spells out — no rounding casts.

    r18 (guide §2.4/§4): the grouped-map exchange is an EXPLICIT hash
    repartition on user_id sized from spark.sql.shuffle.partitions.
    groupBy().applyInPandas alone lets AQE coalesce the tiny post-shuffle
    partitions to 1-3 tasks, serializing the per-group Python calls — the
    one stage here whose cost is Python invocations, not bytes (measured
    3.7 s -> 0.9 s warm at sf0.1/local[32]). The explicit repartition
    satisfies the grouped-map's ClusteredDistribution, so no second
    exchange is added — same shuffle, minus the coalesce; the count is
    conf-derived (bench: = core count; cluster: 2-3x cores), never a
    local constant.
    """
    import math

    import numpy as np

    # ADVICE r18 (low): two-arg get — on deployments where the conf is
    # unset at the SQLConf level the no-default form raises (same
    # defensive pattern as operators/prefix.py)
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    e = (
        tbl(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        .repartition(n_shuffle, "user_id")
    )

    def znorm(pdf: pd.DataFrame) -> pd.DataFrame:
        vc = np.floor(pdf["value"].to_numpy(dtype="float64") * 100 + 0.5).astype("int64")
        n = len(vc)
        s = int(vc.sum())
        qq = int((vc * vc).sum())
        # mirror _ZNORM_ORACLE exactly: mean = S/n; var = (Q - S*S/n)/(n-1)
        var = (float(qq) - float(s) * float(s) / n) / (n - 1) if n > 1 else 0.0
        if n > 1 and var > 0:
            mean = float(s) / n
            sd = math.sqrt(var)
            vals = (vc.astype("float64") - mean) / sd
            znorm_col = pd.array(vals, dtype="Float64")
        else:
            znorm_col = pd.array([None] * n, dtype="Float64")
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "znorm": znorm_col}
        )

    out = e.groupBy("user_id").applyInPandas(
        znorm, schema="event_id long, user_id long, znorm double"
    )
    return out.select("event_id", "user_id", "znorm").orderBy("event_id")


@register(
    "xh_znorm_window",
    oracle=_ZNORM_ORACLE,
    tags=("window", "udf-free-variant"),
)
def h_znorm_window(spark, sf_dir):
    """q67's semantics with NO Python in the plan: per-user z-normalization
    as built-in window aggregates over exact integer cents (sum, sum of
    squares, count — then the fixed IEEE mean/variance op sequence of
    _ZNORM_ORACLE). This is the production path — whole-stage-codegen'd, no
    Arrow transfer, no per-group pandas materialization; q67 remains as the
    grouped-map applyInPandas surface demo. At 100 TB the two shuffle
    identically (one exchange on user_id) but this variant keeps the hot
    loop JVM-side (SURVEY 'UDFs are the slow path')."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id")
    e = tbl(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long").alias("vc"),
    )
    s = F.sum("vc").over(w).cast("double")
    qq = F.sum(F.col("vc") * F.col("vc")).over(w).cast("double")
    n = F.count("vc").over(w)
    var = (qq - s * s / n) / (n - 1)
    z = (F.col("vc").cast("double") - s / n) / F.sqrt(var)
    return (
        e.select(
            "event_id",
            "user_id",
            F.when((n > 1) & (var > 0), z).otherwise(F.lit(None).cast("double")).alias("znorm"),
        )
        .orderBy("event_id")
    )


@register(
    "xh_udtf_generate",
    oracle="""SELECT r_regionkey, unnest(generate_series(1, CAST(r_regionkey AS BIGINT) + 1)) AS i
              FROM region ORDER BY r_regionkey, i""",
    tags=("udf", "udtf"),
)
def h_udtf_generate(spark, sf_dir):
    """Python UDTF exploding k=regionkey+1 rows per input row (the
    table-function surface; oracle is unnest(generate_series))."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="r_regionkey int, i bigint")
    class Expand:
        def eval(self, key: int):
            for i in range(1, key + 2):
                yield key, i

    spark.udtf.register("hcs_expand", Expand)
    r = tbl(spark, sf_dir, "region")
    r.createOrReplaceTempView("hcs_region_tmp")
    return spark.sql(
        """SELECT t.r_regionkey, t.i
           FROM hcs_region_tmp, LATERAL hcs_expand(r_regionkey) t
           ORDER BY t.r_regionkey, t.i"""
    )
