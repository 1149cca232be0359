"""Pluggable filesystem layer for the copy job (SURVEY §2a R1/R22).

The reference resolves a Hadoop ``FileSystem`` per namespace from config
(m/service/HdfsFileSystemFactory.java:22-60) and every copy touches the
remote store only through that handle (HdfsCopyService.java:124). Rounds
1-5 of this engine hard-wired ``os``/``open`` local I/O into the copy path
(VERDICT r5 "What's missing" #1); this module is the seam that makes a
remote scheme a CONFIG change, not a rewrite:

- bare paths  -> ``LocalFS``: the original ``os``-level fast path, range-
  write capable (the byte-range split plan stays available);
- ``scheme://`` paths -> ``ArrowFS``: any filesystem
  ``pyarrow.fs.FileSystem.from_uri`` can build (``file://``, ``hdfs://``,
  ``s3://``, ``gs://`` — HDFS picks up the per-namespace Hadoop config the
  engine applied via ``CopyJobEngine.configure_namespace``, which is how
  the reference's per-namespace ``Configuration`` maps here). Arrow output
  streams are append-only (exactly like HDFS), so ``supports_range_write``
  is False and the planner keeps such files on the single-stream path —
  the documented scale plan for append-only stores is chunk part-files +
  server-side concat (DistCp strategy), which slots in behind this same
  interface.

Unqualified paths resolve against the namespace's ``fs.defaultFS`` exactly
like Hadoop's ``Path.getFileSystem`` (``qualify``): the reference's copy
requests carry bare HDFS paths for the same reason.

Executors re-resolve filesystems from the path string per task (instances
here hold no sockets and pickle trivially); per-process Arrow filesystem
handles are memoized by (scheme, authority).
"""

from __future__ import annotations

import os
import posixpath
from typing import Iterable, Optional


def scheme_of(path: str) -> Optional[str]:
    """URI scheme of ``path``, or None for a bare local path."""
    if "://" in path:
        return path.split("://", 1)[0]
    return None


def qualify(path: str, namespace_conf: Optional[dict] = None) -> str:
    """Resolve an unqualified path against the namespace's ``fs.defaultFS``
    (Hadoop ``Path`` semantics; identity for already-qualified paths)."""
    if scheme_of(path) is not None:
        return path
    default_fs = (namespace_conf or {}).get("fs.defaultFS")
    if default_fs and scheme_of(default_fs) is not None:
        scheme, rest = default_fs.split("://", 1)
        authority = rest.split("/", 1)[0]  # e.g. nn:8020; empty for file://
        return scheme + "://" + authority + "/" + path.lstrip("/")
    return path


def parent(path: str) -> str:
    if scheme_of(path) is not None:
        scheme, rest = path.split("://", 1)
        return scheme + "://" + posixpath.dirname(rest)
    return os.path.dirname(path)


class LocalFS:
    """Bare-path local filesystem — the reference-parity fast path."""

    supports_range_write = True  # POSIX pwrite-style disjoint ranges are safe

    def join(self, base: str, rel: str) -> str:
        return os.path.join(base, rel)

    def exists(self, p: str) -> bool:
        return os.path.exists(p)

    def isdir(self, p: str) -> bool:
        return os.path.isdir(p)

    def size(self, p: str) -> int:
        return os.path.getsize(p)

    def walk_files(self, root: str) -> list[str]:
        """Relative paths of every file under ``root``, sorted."""
        out = []
        for r, _dirs, names in os.walk(root):
            for name in names:
                out.append(os.path.relpath(os.path.join(r, name), root))
        return sorted(out)

    def walk_files_with_size(self, root: str) -> list[tuple]:
        """Sorted ``(relative_path, size)`` of every file under ``root`` —
        one enumeration pass instead of a walk plus per-file size RPCs."""
        out = []
        for r, _dirs, names in os.walk(root):
            for name in names:
                full = os.path.join(r, name)
                out.append((os.path.relpath(full, root), os.path.getsize(full)))
        return sorted(out)

    def list_dir(self, p: str) -> list[tuple]:
        """Sorted non-recursive ``(name, is_dir)`` entries of directory
        ``p`` — the fan-out unit for distributed listing."""
        with os.scandir(p) as it:
            return sorted((e.name, e.is_dir()) for e in it)

    def mkdirs(self, p: str) -> None:
        if p:
            os.makedirs(p, exist_ok=True)

    def open_read(self, p: str):
        return open(p, "rb")

    def create(self, p: str):
        self.mkdirs(parent(p))
        return open(p, "wb")

    def open_rw(self, p: str):
        """Seekable read-write handle, create-if-missing, NO truncate —
        concurrent chunk tasks must not clobber each other's ranges."""
        self.mkdirs(parent(p))
        fd = os.open(p, os.O_RDWR | os.O_CREAT, 0o644)
        return os.fdopen(fd, "r+b")

    def truncate_file(self, p: str, size: int) -> None:
        self.mkdirs(parent(p))
        with open(p, "wb") as f:
            f.truncate(size)

    def replace(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def remove(self, p: str) -> None:
        os.remove(p)


class ArrowFS:
    """URI-addressed filesystem via ``pyarrow.fs.FileSystem.from_uri``.

    Append-only write model (like HDFS/object stores): no range writes, so
    split planning is disabled for these destinations (see module doc)."""

    supports_range_write = False

    # (scheme, authority) -> (pyarrow FileSystem, authority_in_path).
    # The native-path convention differs per filesystem family: host-
    # authority schemes drop the authority (from_uri('hdfs://nn/a') ->
    # '/a', same for file://), while object stores keep the bucket IN the
    # path (from_uri('gs://bucket/key') -> 'bucket/key'; hand-stripping it
    # sent every s3/gs op to a wrong bucketless path — ADVICE r6). Rather
    # than hard-coding a scheme list, the convention is LEARNED from
    # from_uri's own return on the first call per (scheme, authority) and
    # cached alongside the handle; cache hits rebuild the native path under
    # the recorded convention without re-constructing the filesystem
    # (from_uri re-resolves HDFS/S3 connections — too expensive per op).
    _HANDLES: dict = {}

    def _resolve(self, p: str):
        import pyarrow.fs as pafs

        scheme, rest = p.split("://", 1)
        authority, _, tail = rest.partition("/")
        key = (scheme, authority)
        cached = self._HANDLES.get(key)
        if cached is None:
            fs, native = pafs.FileSystem.from_uri(p)
            authority_in_path = bool(authority) and (
                native == authority or native.startswith(authority + "/")
            )
            self._HANDLES[key] = (fs, authority_in_path)
            return fs, native
        fs, authority_in_path = cached
        if authority_in_path:
            native = authority + ("/" + tail if tail else "")
        else:
            native = "/" + tail
        return fs, native

    def join(self, base: str, rel: str) -> str:
        return base.rstrip("/") + "/" + rel

    def _info(self, p: str):
        fs, native = self._resolve(p)
        return fs.get_file_info(native)

    def exists(self, p: str) -> bool:
        import pyarrow.fs as pafs

        return self._info(p).type != pafs.FileType.NotFound

    def isdir(self, p: str) -> bool:
        import pyarrow.fs as pafs

        return self._info(p).type == pafs.FileType.Directory

    def size(self, p: str) -> int:
        return self._info(p).size

    def walk_files(self, root: str) -> list[str]:
        import pyarrow.fs as pafs

        fs, native = self._resolve(root)
        sel = pafs.FileSelector(native, recursive=True)
        out = [
            posixpath.relpath(info.path, native)
            for info in fs.get_file_info(sel)
            if info.type == pafs.FileType.File
        ]
        return sorted(out)

    def walk_files_with_size(self, root: str) -> list[tuple]:
        """Sorted ``(relative_path, size)`` — FileInfo already carries the
        size, so this is the same single listing RPC as walk_files."""
        import pyarrow.fs as pafs

        fs, native = self._resolve(root)
        sel = pafs.FileSelector(native, recursive=True)
        return sorted(
            (posixpath.relpath(info.path, native), info.size)
            for info in fs.get_file_info(sel)
            if info.type == pafs.FileType.File
        )

    def list_dir(self, p: str) -> list[tuple]:
        """Sorted non-recursive ``(name, is_dir)`` entries of ``p``."""
        import pyarrow.fs as pafs

        fs, native = self._resolve(p)
        sel = pafs.FileSelector(native, recursive=False)
        return sorted(
            (
                posixpath.relpath(info.path, native),
                info.type == pafs.FileType.Directory,
            )
            for info in fs.get_file_info(sel)
        )

    def mkdirs(self, p: str) -> None:
        fs, native = self._resolve(p)
        fs.create_dir(native, recursive=True)

    def open_read(self, p: str):
        fs, native = self._resolve(p)
        return fs.open_input_file(native)  # seekable

    def create(self, p: str):
        fs, native = self._resolve(p)
        self.mkdirs(parent(p))
        return fs.open_output_stream(native)

    def open_rw(self, p: str):
        raise NotImplementedError(
            "range writes are not supported on append-only stores; the "
            "planner must not split files whose destination lacks "
            "supports_range_write"
        )

    truncate_file = open_rw  # same constraint: split-planning only

    def replace(self, src: str, dst: str) -> None:
        fs, native_src = self._resolve(src)
        _, native_dst = self._resolve(dst)
        fs.move(native_src, native_dst)

    def remove(self, p: str) -> None:
        fs, native = self._resolve(p)
        fs.delete_file(native)


_LOCAL = LocalFS()
_ARROW = ArrowFS()


def fs_for(path: str):
    """Filesystem adapter for ``path`` — the engine's HdfsFileSystemFactory.
    Stateless dispatch on the path's scheme, so executors resolve the same
    way the driver did from nothing but the work-row strings."""
    return _LOCAL if scheme_of(path) is None else _ARROW
