"""Helpers to assert plan shape: the 100 TB discipline is enforced by
checking what Catalyst actually planned, not by trusting the DSL.

Used by tests/test_plans.py to pin:
- filter/column pushdown into the parquet scan (PushedFilters/ReadSchema),
- broadcast joins on dimension tables (BroadcastHashJoin),
- global top-k compiling to TakeOrderedAndProject (no full sort shuffle),
- partial aggregation (two HashAggregate levels -> map-side combine),
- whole-stage codegen coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def plan_has(df: DataFrame, *needles: str, mode: str = "formatted") -> dict:
    """Return {needle: bool} presence map over the explain output."""
    text = explain_str(df, mode)
    return {n: (n in text) for n in needles}
