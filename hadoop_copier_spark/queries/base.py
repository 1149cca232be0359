"""Shared helpers for declared queries."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table, register_views

__all__ = ["tbl", "views", "dec", "money_sum", "dec_avg", "F"]


def _pin_session(spark: SparkSession) -> None:
    """Defensive: declared queries may run in the driver's own session —
    pin the settings the oracle contract depends on (UTC timestamps) and
    the nanos-parquet shim. Idempotent, runtime-settable confs only."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _pin_session(spark)
    return load_table(spark, sf_dir, name)


def views(spark: SparkSession, sf_dir: str) -> None:
    _pin_session(spark)
    register_views(spark, sf_dir)


def dec(c: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """DECIMAL cast used for oracle-deterministic money arithmetic."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(f"decimal({precision},{scale})")


def money_sum(c: Column | str, alias: str) -> Column:
    """SUM over DECIMAL(12,2)-cast values, widened (scale-preserving) to
    DECIMAL(38,2) for a stable schema.

    Decimal addition is exact and order-independent, so the result is
    bit-identical across Spark partitionings and the DuckDB oracle
    (SURVEY §2b rule 2); a raw double sum would not be.

    DETERMINISM RULES (validated empirically against DuckDB 1.0):
    - Raw money columns are exact 2-dp values -> cast DECIMAL(12,2) is safe.
    - Do arithmetic in the decimal domain (cast operands BEFORE multiply);
      casting a computed double to decimal rounds differently per engine
      (Spark: shortest-string HALF_UP; DuckDB: binary-value nearest).
    - NEVER scale-reduce a decimal after aggregation: DuckDB truncates on
      decimal->decimal scale reduction, Spark rounds HALF_UP.
    - double->decimal casts are tie-free for scale>=1 (a double can never be
      exactly k + 5*10^-(s+1)) so both engines round-to-nearest identically.
    """
    return F.sum(dec(c, 12, 2)).cast("decimal(38,2)").alias(alias)


def dec_avg(c: Column | str, alias: str, scale: int = 6) -> Column:
    """Deterministic average: exact decimal sum -> double -> divide -> decimal.

    The decimal sum is exact in both engines; double conversion and the
    division are single IEEE ops, and the final double->decimal cast is
    tie-free, so the result matches the oracle exactly.
    """
    c = F.col(c) if isinstance(c, str) else c
    return (
        (F.sum(dec(c, 12, 2)).cast("double") / F.count(c))
        .cast(f"decimal(18,{scale})")
        .alias(alias)
    )


# DuckDB-side spelling of the same two aggregation idioms (kept next to the
# Spark forms so every query cites one definition of "deterministic money").
ORACLE_MONEY_SUM = "CAST(SUM(CAST({x} AS DECIMAL(12,2))) AS DECIMAL(38,2))"
ORACLE_DEC_AVG = "CAST(CAST(SUM(CAST({x} AS DECIMAL(12,2))) AS DOUBLE) / COUNT({x}) AS DECIMAL(18,{s}))"
