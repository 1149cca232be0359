"""Content-defined chunking (operators/chunking.py): reconstruction,
size bounds, the vectorized rolling hash vs a naive reference, and THE
CDC property — boundary re-synchronization after an insertion, which
fixed-stride chunking cannot do."""

import hashlib
import random

import numpy as np
import pytest

from hadoop_copier_spark.operators.chunking import (
    CDC_MAX,
    CDC_MIN,
    CDC_WINDOW,
    _POWS,
    _rolling_hash,
    cdc_chunks,
    chunk_doc,
)
from hadoop_copier_spark.queries import REGISTRY


def _rand(n, seed):
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(n))


def test_chunks_reconstruct_and_respect_bounds():
    data = _rand(5000, 7)
    chunks = chunk_doc(data)
    assert b"".join(data[o : o + l] for o, l, _ in chunks) == data
    assert all(l <= CDC_MAX for _, l, _ in chunks)
    # every chunk except possibly the LAST respects the minimum
    assert all(l >= CDC_MIN for _, l, _ in chunks[:-1])
    for (o1, l1, _), (o2, _, _) in zip(chunks, chunks[1:]):
        assert o1 + l1 == o2  # contiguous, no gaps


def test_degenerate_inputs():
    assert chunk_doc(b"") == []
    tiny = chunk_doc(b"abc")  # shorter than the hash window: one chunk
    assert len(tiny) == 1 and tiny[0][:2] == (0, 3)
    flat = chunk_doc(b"\x00" * 1000)  # zero bytes hash to 0 everywhere:
    # every position is a candidate; min/max enforcement still bounds sizes
    assert all(CDC_MIN <= l <= CDC_MAX for _, l, _ in flat[:-1])


def test_rolling_hash_matches_naive_reference():
    buf = np.frombuffer(_rand(300, 11), dtype=np.uint8)
    h = _rolling_hash(buf)
    for i in range(len(h)):
        acc = 0
        for j in range(CDC_WINDOW):
            acc = (acc + int(buf[i + j]) * int(_POWS[j])) % (1 << 64)
        assert int(h[i]) == acc


def test_shift_invariance_beats_stride():
    """Prepend 37 bytes: CDC chunk hashes re-synchronize (>= 90%
    preserved); 64-byte fixed-stride chunks share essentially nothing."""
    data = _rand(5000, 7)
    prefix = _rand(37, 13)
    c1 = {h for _, _, h in chunk_doc(data)}
    c2 = {h for _, _, h in chunk_doc(prefix + data)}
    cdc_overlap = len(c1 & c2) / len(c1)

    def stride(d):
        return {
            hashlib.md5(d[i : i + 64]).hexdigest() for i in range(0, len(d), 64)
        }

    s1, s2 = stride(data), stride(prefix + data)
    stride_overlap = len(s1 & s2) / len(s1)
    assert cdc_overlap >= 0.9, cdc_overlap
    assert stride_overlap <= 0.1, stride_overlap
    assert cdc_overlap > stride_overlap


def test_edit_in_middle_perturbs_o1_chunks():
    data = bytearray(_rand(5000, 7))
    before = {h for _, _, h in chunk_doc(bytes(data))}
    data[2500:2500] = b"XYZ"  # 3-byte insertion mid-document
    after = {h for _, _, h in chunk_doc(bytes(data))}
    # all but a handful of chunks survive the edit
    assert len(before & after) >= len(before) - 4


def test_spark_chunks_match_local_reference(spark, sf_smoke):
    from hadoop_copier_spark.tables import load_table

    d = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_len"], r["chunk_hash"])
        for r in cdc_chunks(d).collect()
    }
    expect = {}
    for r in d.collect():
        if r["text"]:
            for i, (o, l, h) in enumerate(chunk_doc(r["text"].encode("utf-8"))):
                expect[(r["doc_id"], i)] = (l, h)
    assert got == expect


def test_registry_entry_reports_cross_doc_dups(spark, sf_smoke):
    out = REGISTRY["xp_cdc_chunking"].fn(spark, sf_smoke).toPandas()
    assert (out["n_docs"] >= 2).all()
    assert len(out) > 0  # the fixture's near-dup docs share exact substrings
    assert out["occ"].ge(out["n_docs"]).all()
