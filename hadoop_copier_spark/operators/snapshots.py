"""Versioned snapshot tables: manifest-based time travel over parquet.

The reference engine copies bytes; its users land those bytes in tables
and then need what every training pipeline needs from its corpus store:
*reproducibility* — "train on exactly the corpus of version N", even
after later appends, overwrites, or compactions. This module is the
minimal lakehouse pattern that provides it, built only on parquet + an
atomic manifest swap (the same design core as Delta/Iceberg commit logs,
re-expressed from public first principles):

- every write creates an immutable data directory and a NEW manifest
  ``_manifests/v{N}.json`` listing the exact files of that version;
- a manifest is committed by ``os.replace`` of a temp file — readers
  either see the complete version or not at all;
- readers plan from the manifest's file list, NEVER from directory
  listing — O(manifest) planning, immune to eventually-consistent
  listings and to concurrent writers' half-written data dirs;
- ``append`` reuses prior versions' files untouched (no rewrite of
  history), ``overwrite`` starts a fresh file set, ``rollback`` commits
  a new version that points at an old version's files (history is never
  mutated), ``vacuum`` deletes only data unreferenced by the manifests
  being kept.

Scale: the data path is ordinary distributed parquet I/O; the manifest
path is O(files-in-version) driver-side JSON. At 100 TB the manifest
lists thousands of file paths — kilobytes to megabytes — and committing
is one rename, so snapshot overhead is independent of data size.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "write_snapshot",
    "read_snapshot",
    "list_versions",
    "rollback",
    "vacuum",
]

_MANIFESTS = "_manifests"
_DATA = "data"


def _manifest_dir(table_dir: str) -> str:
    return os.path.join(table_dir, _MANIFESTS)


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(_manifest_dir(table_dir), f"v{version:06d}.json")


def list_versions(table_dir: str) -> list[int]:
    md = _manifest_dir(table_dir)
    if not os.path.isdir(md):
        return []
    out = []
    for name in os.listdir(md):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as f:
        return json.load(f)


def _commit_manifest(table_dir: str, manifest: dict) -> None:
    """Atomic commit: full write to a temp name, then os.replace — a
    reader of v{N}.json sees the complete manifest or ENOENT, never a
    prefix."""
    md = _manifest_dir(table_dir)
    os.makedirs(md, exist_ok=True)
    final = _manifest_path(table_dir, manifest["version"])
    if os.path.exists(final):
        raise ValueError(
            f"version {manifest['version']} already committed (concurrent "
            "writer lost the race); re-read latest and retry"
        )
    tmp = final + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)


def _write_data(df: DataFrame, table_dir: str, version: int) -> list[str]:
    out = os.path.join(
        table_dir, _DATA, f"v{version:06d}-{uuid.uuid4().hex[:8]}"
    )
    df.write.mode("errorifexists").parquet(out)
    return sorted(
        os.path.join(out, f)
        for f in os.listdir(out)
        if f.endswith(".parquet")
    )


def write_snapshot(
    df: DataFrame, table_dir: str, mode: str = "overwrite",
    meta: dict | None = None,
) -> int:
    """Commit ``df`` as the next table version; returns the version.

    ``overwrite``: the new version's file set is exactly this write.
    ``append``:    the new version = previous version's files (reused
                   in place, never rewritten) + this write's files.
    ``meta``: extra keys recorded in the manifest (e.g. a streaming
              batch id for idempotent sinks).
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    versions = list_versions(table_dir)
    version = (versions[-1] + 1) if versions else 1
    files = _write_data(df, table_dir, version)
    if mode == "append" and versions:
        files = _read_manifest(table_dir, versions[-1])["files"] + files
    manifest = {
        "version": version,
        "mode": mode,
        "files": files,
        "n_files": len(files),
        "committed_at": time.time(),
        "schema": df.schema.json(),
    }
    if meta:
        manifest["meta"] = meta
    _commit_manifest(table_dir, manifest)
    return version


def version_metas(table_dir: str) -> dict[int, dict]:
    """{version: manifest 'meta' dict} for every committed version."""
    return {
        v: _read_manifest(table_dir, v).get("meta", {})
        for v in list_versions(table_dir)
    }


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: the table exactly as of ``version`` (default
    latest). Plans from the manifest's file list — later appends,
    overwrites, and compactions never change what this returns."""
    versions = list_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no committed versions under {table_dir}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(f"version {v} not in {versions}")
    return spark.read.parquet(*_read_manifest(table_dir, v)["files"])


def rollback(table_dir: str, to_version: int) -> int:
    """Commit a NEW version whose file set is ``to_version``'s — history
    is append-only, so the bad versions stay inspectable."""
    m = _read_manifest(table_dir, to_version)
    version = list_versions(table_dir)[-1] + 1
    _commit_manifest(
        table_dir,
        {
            "version": version,
            "mode": f"rollback(v{to_version})",
            "files": m["files"],
            "n_files": m["n_files"],
            "committed_at": time.time(),
            "schema": m["schema"],
        },
    )
    return version


def vacuum(table_dir: str, keep_last: int = 2) -> list[str]:
    """Delete data directories referenced by NO kept manifest; manifests
    older than ``keep_last`` are dropped first. Returns removed dirs.
    Files still referenced by any kept version are untouched, so every
    kept version remains exactly readable."""
    versions = list_versions(table_dir)
    keep = set(versions[-keep_last:]) if keep_last > 0 else set()
    for v in versions:
        if v not in keep:
            os.remove(_manifest_path(table_dir, v))
    live: set[str] = set()
    for v in keep:
        for f in _read_manifest(table_dir, v)["files"]:
            live.add(os.path.dirname(f))
    removed = []
    data_root = os.path.join(table_dir, _DATA)
    if os.path.isdir(data_root):
        for d in sorted(os.listdir(data_root)):
            full = os.path.join(data_root, d)
            if full not in live:
                shutil.rmtree(full)
                removed.append(full)
    return removed
