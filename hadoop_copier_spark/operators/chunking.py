"""Content-defined chunking (CDC) — rolling-hash boundaries for
shift-robust chunk-level deduplication.

Fixed-stride chunking (xh_chunk_dedup's word windows) breaks under
insertion: prepending one byte shifts EVERY later chunk boundary, so two
documents that differ by a short prefix share no chunk hashes and the
dedup misses them. Content-defined chunking cuts where a rolling hash of
the last W bytes hits a mask condition — boundaries are a function of
LOCAL content, so an edit perturbs only the O(1) chunks it touches and
every later boundary re-synchronizes (the LBFS/rsync family; property
pinned in tests/test_chunking.py::test_shift_invariance_beats_stride).

Scale shape: chunking is a PURE MAP — ``mapInPandas`` over the document
partitions, bytes never leave their executor, no shuffle. The heavy loop
is vectorized: each Arrow batch's texts are concatenated into ONE numpy
byte array and the polynomial rolling hash over every position is W=16
shifted uint64 multiply-adds for the whole batch (wraparound arithmetic
is mod-2^64 for free); per document only the sparse candidate-boundary
list (expected one per MEAN bytes) is walked in Python to enforce
min/max chunk sizes. Downstream dedup is one groupBy on the chunk hash —
uniform keys by construction.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cdc_chunks", "chunk_doc", "CDC_WINDOW", "CDC_MEAN", "CDC_MIN", "CDC_MAX"]

CDC_WINDOW = 16  # rolling-hash window (bytes)
CDC_MEAN = 64  # expected chunk size: boundary when low log2(MEAN) bits == 0
CDC_MIN = 24  # candidates closer than MIN to the last cut are skipped
CDC_MAX = 192  # a cut is forced at MAX regardless of content

_A = 0x9E3779B97F4A7C15  # odd multiplier (2^64 golden ratio)
# A^(W-1), ..., A^1, A^0 (mod 2^64): the polynomial weights, highest power
# on the OLDEST byte so the hash is the standard Rabin-style polynomial.
# Built with Python ints (numpy SCALAR uint64 overflow warns; array ops
# wrap silently, which is what _rolling_hash relies on).
_POWS = np.array(
    [pow(_A, CDC_WINDOW - 1 - j, 1 << 64) for j in range(CDC_WINDOW)], dtype=np.uint64
)
_MASK = np.uint64(CDC_MEAN - 1)


def _rolling_hash(buf: np.ndarray) -> np.ndarray:
    """h[i] = sum_j buf[i+j] * A^(W-1-j) mod 2^64 for every window start
    i in [0, len-W]. W shifted multiply-adds over the whole buffer —
    vectorized, no per-position Python."""
    n = buf.shape[0] - CDC_WINDOW + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    h = np.zeros(n, dtype=np.uint64)
    b = buf.astype(np.uint64)
    for j in range(CDC_WINDOW):
        h += b[j : j + n] * _POWS[j]
    return h


def _cut_points(candidates: np.ndarray, length: int) -> list[int]:
    """Greedy min/max enforcement over ascending candidate cut positions
    (each the byte index AFTER a window whose hash matched). Walks only
    the sparse candidate list; forces a cut every CDC_MAX bytes of
    candidate drought. Returns cut positions excluding 0, including
    ``length``."""
    cuts = []
    last = 0
    for p in candidates:
        p = int(p)
        while p - last > CDC_MAX:  # drought: force stride cuts
            last += CDC_MAX
            cuts.append(last)
        if p - last >= CDC_MIN:
            cuts.append(p)
            last = p
    while length - last > CDC_MAX:
        last += CDC_MAX
        cuts.append(last)
    if length > 0 and (not cuts or cuts[-1] != length):
        cuts.append(length)
    return cuts


def chunk_doc(data: bytes) -> list[tuple[int, int, str]]:
    """Reference/unit entry point: chunk one byte string. Returns
    (offset, length, md5hex) per chunk; empty input -> no chunks.
    Concatenating the chunks reproduces the input exactly."""
    buf = np.frombuffer(data, dtype=np.uint8)
    h = _rolling_hash(buf)
    cand = (np.flatnonzero((h & _MASK) == np.uint64(0)) + CDC_WINDOW) if h.size else np.empty(0)
    cuts = _cut_points(cand, len(data))
    out, start = [], 0
    for c in cuts:
        out.append((start, c - start, hashlib.md5(data[start:c]).hexdigest()))
        start = c
    return out


def cdc_chunks(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(<id_col>, chunk_idx, chunk_len, chunk_hash) for every document —
    the id column keeps the INPUT column's name and type (ADVICE r11: the
    schema used to hardcode ``doc_id long``, silently renaming/miscasting
    any other caller's id). NULL/empty texts produce no rows (degrade,
    never fail — the null-injection rule). Map-only: one ``mapInPandas``
    pass, the rolling hash computed over the batch's concatenated bytes
    in one set of vectorized passes."""
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"`{id_col}` {id_type}, chunk_idx long, chunk_len long, chunk_hash string"
    )

    def gen(batches):
        for pdf in batches:
            ids, texts = pdf[id_col].values, pdf[text_col].values
            blobs = [
                t.encode("utf-8") if isinstance(t, str) and t else b"" for t in texts
            ]
            joined = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            h_all = _rolling_hash(joined) if joined.size else np.empty(0, np.uint64)
            out_id, out_idx, out_len, out_hash = [], [], [], []
            off = 0
            for did, data in zip(ids, blobs):
                n = len(data)
                if n:
                    # valid window starts for THIS doc: [off, off+n-W]
                    lo, hi = off, off + max(n - CDC_WINDOW + 1, 0)
                    seg = h_all[lo:hi]
                    cand = np.flatnonzero((seg & _MASK) == np.uint64(0)) + CDC_WINDOW
                    start = 0
                    for i, c in enumerate(_cut_points(cand, n)):
                        out_id.append(did)
                        out_idx.append(i)
                        out_len.append(c - start)
                        out_hash.append(hashlib.md5(data[start:c]).hexdigest())
                        start = c
                off += n
            import pandas as pd

            yield pd.DataFrame(
                {
                    # object dtype: Arrow casts to the declared id type,
                    # whatever it is (int64 for the default long id)
                    id_col: pd.Series(out_id, dtype="object"),
                    "chunk_idx": pd.Series(out_idx, dtype="int64"),
                    "chunk_len": pd.Series(out_len, dtype="int64"),
                    "chunk_hash": pd.Series(out_hash, dtype="object"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(gen, out_schema)
