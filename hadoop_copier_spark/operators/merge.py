"""MERGE INTO (upsert) emulation (guide 'CDC / SCD2' pattern).

Without a lakehouse table format (Delta/Iceberg jars are not in this
container), upsert = anti-join the base against the change set's keys,
then union the changes:

    merged = base ⟕anti changes.keys  ∪all  changes

At 100 TB this is the standard copy-on-write merge: one shuffle on the
merge key (or none, if base and changes are both bucketed on it), output
rewritten partition-wise. With Delta/Iceberg on the classpath the same
call site becomes ``MERGE INTO`` and goes metadata-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_upsert(base: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """Apply ``changes`` to ``base`` by ``key``: matching rows replaced,
    new rows appended. Column sets must match (unionByName)."""
    kept = base.join(changes.select(key), key, "left_anti")
    return kept.unionByName(changes.select(*base.columns))
