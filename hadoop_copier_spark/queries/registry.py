"""Declared-query registry (SURVEY §2b contract).

Every operator the engine claims is registered here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, for hash-checked
(H-class) queries, the equivalent DuckDB oracle SQL. ``__spark_entry__``
derives its ``queries()`` / ``oracle_sql()`` maps from this registry.

Determinism rules applied to every H query (SURVEY §2b, as amended by
VERDICT r3 #1 — the integer-units rule):
1. fully ordered output (ORDER BY ending in a unique key);
2. money/double aggregation in exact BIGINT integer units (cents etc.,
   base.cents_sum) or final CAST AS DOUBLE — never emitted DECIMAL: the
   driver's pandas harness serializes DuckDB decimals as float64 but
   Spark decimals as Decimal, so trailing-zero cells can never match;
3. events.ts truncated to ms or coarser;
4. collections canonicalized AND serialized to scalars
   (concat_ws over sort_array <-> string_agg ORDER BY) — the driver's
   pandas sort crashes on raw list cells;
5. identical column aliases on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL; None => rows-only (P-class) check
    doc: str = ""
    tags: tuple = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: Optional[str] = None, doc: str = "", tags: tuple = ()):
    """Decorator: register a declared query under ``name``."""

    def deco(fn):
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco
