"""Exactly-once streaming sink into a versioned snapshot table.

``foreachBatch`` gives at-least-once delivery: after a crash/restart the
last in-flight micro-batch can be redelivered with the SAME batch_id.
The standard fix (Structured Streaming docs) is an idempotent writer
keyed on that batch_id. Here the key rides the snapshot manifest
(operators/snapshots.py): each micro-batch commits one ``append``
version whose manifest records its batch_id, and a redelivered batch is
recognized — its id already appears in a committed manifest — and
skipped before any data is written.

The result is a corpus table that is simultaneously:
- exactly-once (re-run/restart never duplicates a batch),
- time-travelable (every micro-batch boundary is a named version a
  training run can pin), and
- atomically visible (a version exists only once its manifest rename
  lands — a reader never sees half a micro-batch).

Scale: the idempotence check reads O(versions) manifest JSONs on the
driver once per micro-batch; data volume is irrelevant to it. A long-
running stream would compact old versions with vacuum(keep_last=...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.snapshots import version_metas, write_snapshot

__all__ = ["committed_batch_ids", "snapshot_batch_writer"]


def committed_batch_ids(table_dir: str) -> set[int]:
    return {
        m["batch_id"] for m in version_metas(table_dir).values()
        if "batch_id" in m
    }


def snapshot_batch_writer(table_dir: str):
    """Return a ``foreachBatch`` function committing each micro-batch as
    one append-mode snapshot version, idempotent on batch_id."""

    def write(df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_batch_ids(table_dir):
            return  # redelivered batch: already durably committed
        write_snapshot(
            df, table_dir, mode="append", meta={"batch_id": int(batch_id)}
        )

    return write
