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
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view named after itself."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
