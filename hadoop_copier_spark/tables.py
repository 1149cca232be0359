"""Fixture-table loading (TESTDATA.md / FIXTURES.md).

Tables are deterministic driver-generated parquet; we read them with footer
schemas (no inference cost, exact types). ``register_views`` exposes them as
temp views so SQL-form operators (GROUPING SETS, etc.) can run.

At 100 TB these reads become partitioned-table scans; nothing here assumes
single-file inputs — ``spark.read.parquet`` takes directories identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables that should always be broadcast in joins at any
# scale (region=5 rows, nation=25 rows — they stay tiny at 100 TB too).
BROADCAST_DIMS = {"region", "nation"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    ([PARQUET_TYPE_ILLEGAL]). Read it as raw int64 nanos and convert to a
    microsecond TimestampType (floor division — matches how DuckDB's
    TIMESTAMP_NS surfaces in Python). All oracle comparisons on ts use
    ms-or-coarser truncation anyway (SURVEY §2b rule 3)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view named after itself."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
