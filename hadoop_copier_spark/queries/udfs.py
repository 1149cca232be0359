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

from .base import dec, tbl
from .registry import register


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
                     CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                          / CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                          AS DECIMAL(18,6)) AS wavg_price
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    tags=("udf", "udaf"),
)
def q66(spark, sf_dir):
    """Grouped-agg pandas UDF (UDAF): quantity-weighted average price.

    Exactness argument: price (2dp) x quantity (2dp) products and their
    group sums stay below 2^53 when scaled, so the float64 arithmetic in
    numpy is EXACT (no rounding anywhere) and order-independent — it equals
    the oracle's decimal-sum-then-divide to the last bit.
    """

    @F.pandas_udf(T.DoubleType())
    def wavg(p: pd.Series, q: pd.Series) -> float:
        num = float((p * q).sum())
        den = float(q.sum())
        return num / den

    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(wavg(F.col("l_extendedprice"), F.col("l_quantity")).alias("wavg_raw"))
        .select("l_returnflag", F.col("wavg_raw").cast("decimal(18,6)").alias("wavg_price"))
        .orderBy("l_returnflag")
    )


@register(
    "q67",
    oracle="""SELECT event_id, user_id,
                     CAST((value - AVG(value) OVER w) / STDDEV_SAMP(value) OVER w
                          AS DECIMAL(18,6)) AS znorm
              FROM events
              WINDOW w AS (PARTITION BY user_id)
              ORDER BY event_id""",
    tags=("udf", "groupedmap"),
)
def q67(spark, sf_dir):
    """Grouped-map applyInPandas: per-user z-normalization of event values.

    The UDF sorts each group by event_id before computing mean/std so the
    float summation order is deterministic; results are 6dp-rounded, which
    absorbs the sub-ulp difference vs the oracle's window aggregate.
    """
    e = tbl(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def znorm(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("event_id")
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)
        pdf["znorm_raw"] = (pdf["value"] - mu) / sd
        return pdf[["event_id", "user_id", "znorm_raw"]]

    out = e.groupBy("user_id").applyInPandas(
        znorm, schema="event_id long, user_id long, znorm_raw double"
    )
    return (
        out.select("event_id", "user_id", F.col("znorm_raw").cast("decimal(18,6)").alias("znorm"))
        .orderBy("event_id")
    )


@register(
    "h_znorm_window",
    oracle="""SELECT event_id, user_id,
                     CAST((value - AVG(value) OVER w) / STDDEV_SAMP(value) OVER w
                          AS DECIMAL(18,6)) AS znorm
              FROM events
              WINDOW w AS (PARTITION BY user_id)
              ORDER BY event_id""",
    tags=("window", "udf-free-variant"),
)
def h_znorm_window(spark, sf_dir):
    """q67's semantics with NO Python in the plan: per-user z-normalization
    as built-in window aggregates (avg/stddev_samp OVER user_id). This is
    the production path — whole-stage-codegen'd, no Arrow transfer, no
    per-group pandas materialization; q67 remains as the grouped-map
    applyInPandas surface demo. At 100 TB the two shuffle identically
    (one exchange on user_id) but this variant keeps the hot loop JVM-side
    (SURVEY 'UDFs are the slow path')."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id")
    e = tbl(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return (
        e.select(
            "event_id",
            "user_id",
            ((F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w))
            .cast("decimal(18,6)")
            .alias("znorm"),
        )
        .orderBy("event_id")
    )


@register(
    "h_udtf_generate",
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
