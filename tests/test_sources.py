"""Binary source + multimodal P checks (SURVEY §2b scans-table P rows):
binaryFile metadata vs hashlib ground truth; BinaryType/struct parquet
round-trip; mapInPandas feature extraction determinism."""

import hashlib

import pytest
from pyspark.sql import functions as F

from hadoop_copier_spark.queries import REGISTRY
from hadoop_copier_spark.sources.binary import read_binary_dir
from hadoop_copier_spark.sources.multimodal import decode_and_featurize, make_multimodal_rows


def test_binaryfile_matches_hashlib(spark, tmp_path):
    files = {"x.bin": b"abc" * 1000, "sub/y.bin": b"\x00\x01\x02" * 7, "sub/z.bin": b""}
    for rel, data in files.items():
        p = tmp_path / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(data)
    rows = (
        read_binary_dir(spark, str(tmp_path))
        .select("path", "length", F.md5("content").alias("m"))
        .collect()
    )
    got = {r["path"].split("/")[-1]: (r["length"], r["m"]) for r in rows}
    # binaryFile skips zero-length files (documented caveat in sources/binary)
    assert "z.bin" not in got
    for rel, data in files.items():
        if not data:
            continue
        name = rel.split("/")[-1]
        assert got[name] == (len(data), hashlib.md5(data).hexdigest())


def test_multimodal_roundtrip_binary_exact(spark, sf_oracle, tmp_path):
    df = make_multimodal_rows(spark, sf_oracle, n=16)
    out = str(tmp_path / "mm")
    df.write.parquet(out)
    back = spark.read.parquet(out)
    orig = {r["sample_id"]: r for r in df.collect()}
    rt = {r["sample_id"]: r for r in back.collect()}
    assert set(orig) == set(rt)
    for k in orig:
        assert bytes(orig[k]["content"]) == bytes(rt[k]["content"])
        assert orig[k]["meta"].asDict() == rt[k]["meta"].asDict()


def test_multimodal_features_deterministic_and_correct(spark, sf_oracle):
    df = make_multimodal_rows(spark, sf_oracle, n=16)
    feats = decode_and_featurize(df).collect()
    orig = {r["sample_id"]: bytes(r["content"]) for r in df.collect()}
    assert len(feats) == 16
    for r in feats:
        b = orig[r["sample_id"]]
        assert r["n_bytes"] == len(b)
        assert r["sha1"] == hashlib.sha1(b).hexdigest()
        assert len(r["feature"]) == 8
    again = decode_and_featurize(df).collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))


def test_p_copyjob_query_shape(spark, sf_oracle):
    rows = REGISTRY["xp_copyjob"].fn(spark, sf_oracle).collect()
    assert [r["task_status"] for r in rows] == ["PARTIALLY_FAILED"] * 2
    by_item = {r["item"]: r for r in rows}
    assert by_item["src"]["item_status"] == "COMPLETED"
    assert by_item["src"]["checksum_ok"] is True
    assert by_item["missing"]["item_status"] == "FAILED"


def test_frame_sampling_counts_offsets_and_reassembly(spark, sf_oracle):
    """sample_frames is exact over the stub frame walk: frame count =
    ceil(len/frame_bytes), sampled indices are 0, n, 2n, ..., and with
    every_n=1 the frames byte-concatenate back to the original payload."""
    import hashlib as _hl

    from hadoop_copier_spark.sources.multimodal import (
        make_video_rows,
        sample_frames,
    )

    df = make_video_rows(spark, sf_oracle, n=8)
    raw = {r.sample_id: bytes(r.content) for r in df.collect()}
    assert any(len(b) > 4096 for b in raw.values())  # multi-frame payloads

    out = sample_frames(df, frame_bytes=4096, every_n=4).collect()
    by_sample = {}
    for r in out:
        by_sample.setdefault(r.sample_id, []).append(r)
    for sid, b in raw.items():
        n_frames = (len(b) + 4095) // 4096
        rows = sorted(by_sample[sid], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in rows] == list(range(0, n_frames, 4))
        assert all(r.n_frames == n_frames for r in rows)
        for r in rows:
            fb = b[r.frame_offset:r.frame_offset + 4096]
            assert r.frame_sha1 == _hl.sha1(fb).hexdigest()

    # every_n=1: full frame stream reassembles the payload exactly
    full = sample_frames(df, frame_bytes=4096, every_n=1).collect()
    for sid, b in raw.items():
        rows = sorted((r for r in full if r.sample_id == sid),
                      key=lambda r: r.frame_idx)
        frames = [b[r.frame_offset:r.frame_offset + 4096] for r in rows]
        assert b"".join(frames) == b
        assert all(
            r.frame_sha1 == _hl.sha1(f).hexdigest()
            for r, f in zip(rows, frames)
        )


def test_resize_images_exact_target_size_and_deterministic(spark, sf_oracle):
    from hadoop_copier_spark.sources.multimodal import (
        make_multimodal_rows,
        resize_images,
    )

    df = make_multimodal_rows(spark, sf_oracle, n=16).filter(
        "modality = 'image'"
    )
    a = {r.sample_id: bytes(r.content) for r in resize_images(df, 8, 8).collect()}
    b = {r.sample_id: bytes(r.content) for r in resize_images(df, 8, 8).collect()}
    assert a == b  # deterministic across runs
    assert all(len(v) == 64 for v in a.values())  # exactly width*height bytes
    wide = resize_images(df, 16, 4).collect()
    assert all(r.n_bytes == 64 and len(bytes(r.content)) == 64 for r in wide)
    # resample draws from the source payload (not constant output)
    assert len(set(a.values())) > 1


def test_audio_pcm_features_exact(spark, sf_smoke):
    """Audio path (round 12): the PCM payload decodes to EXACTLY the
    waveform the generator wrote (int16 LE round-trip), silent samples
    (id % 4 == 0) produce zero energy and zero crossings, and tone
    energies equal amp^2 exactly (square wave -> mean of squares ==
    amp^2 in integer math)."""
    import numpy as np

    from hadoop_copier_spark.queries import REGISTRY
    from hadoop_copier_spark.sources.multimodal import make_audio_rows

    rows = {r["sample_id"]: bytes(r["content"])
            for r in make_audio_rows(spark, sf_smoke, n=8).collect()}
    x1 = np.frombuffer(rows[1], dtype="<i2")
    assert x1.shape[0] == 400
    amp1 = 1000 + (1 % 8) * 100
    assert set(np.abs(x1)) == {amp1}  # square wave at exactly +/-amp

    out = REGISTRY["xp_audio_features"].fn(spark, sf_smoke).collect()
    assert out
    by = {}
    for r in out:
        by.setdefault(r["sample_id"], []).append(r)
    for sid, frames in by.items():
        assert [r["frame_idx"] for r in frames] == list(range(len(frames)))
        if sid % 4 == 0:  # planted silence
            assert all(r["energy"] == 0 and r["zero_crossings"] == 0 for r in frames)
        else:
            amp = 1000 + (sid % 8) * 100
            assert all(r["energy"] == amp * amp for r in frames)
            assert all(r["zero_crossings"] > 0 for r in frames)
    # determinism
    again = REGISTRY["xp_audio_features"].fn(spark, sf_smoke).collect()
    assert out == again


def test_audio_features_degrade_on_empty_and_null(spark):
    from hadoop_copier_spark.sources.multimodal import audio_frame_features

    df = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(1, None), (2, b""), (3, b"\x01")], 2  # null, empty, odd byte
        ),
        "sample_id long, content binary",
    )
    out = audio_frame_features(df).collect()
    assert out == []  # degrade, never fail


def test_image_phash_reference_and_neardup_guarantee(spark, sf_oracle):
    """The aHash must equal a numpy re-derivation per payload (exact
    bit packing, signed reinterpretation); the banded join must surface
    every planted same-length single-byte edit as a low-hamming pair and
    must stay free of self-pairs and duplicates."""
    import numpy as np

    from hadoop_copier_spark.sources.multimodal import image_phash

    base = make_multimodal_rows(spark, sf_oracle, n=16).filter(
        F.col("modality") == "image"
    )
    got = {r["sample_id"]: r["phash"] for r in image_phash(base).collect()}
    for r in base.collect():
        b = bytes(r["content"])
        idx = np.linspace(0, len(b) - 1, 64).astype(int)
        cells = np.frombuffer(b, dtype=np.uint8)[idx].astype(np.float64)
        v = 0
        for bit in (cells >= cells.mean()).astype(int):
            v = (v << 1) | int(bit)
        if v >= 1 << 63:
            v -= 1 << 64
        assert got[r["sample_id"]] == v
    # registry query: planted near-dups found, no junk
    rows = REGISTRY["xp_image_phash"].fn(spark, sf_oracle).collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    assert len(pairs) == len(rows)  # distinct-collapse held
    for i in range(0, 8, 2):
        assert pairs[(i, i + 1000)] <= 6
    assert all(a < b for a, b in pairs)
    assert all(h <= 6 for h in pairs.values())


def test_image_phash_injected_decoder_drives_real_decode_wiring(spark, sf_oracle):
    """The real-decode path (VERDICT r12 #5): ``ahash_cells`` prefers a
    real decoder over the byte resample, and ``image_phash`` threads it
    through the Arrow workers. Pillow is absent in this container, so a
    deterministic fake decoder (pickled by value into the workers)
    stands in: the Spark output must lockstep a local numpy
    re-derivation THROUGH THE DECODER, and must differ from the
    resample-path hash for at least one payload (proving the injected
    path actually ran, not the fallback)."""
    import numpy as np

    from hadoop_copier_spark.sources.multimodal import (
        ahash64,
        ahash_cells,
        image_phash,
    )

    def fake_decode(b):
        # stands in for Image.convert("L").resize((8, 8)): 64 cells,
        # deterministic, payload-dependent, NOT the resample formula
        return np.array(
            [(b[(i * 7) % len(b)] ^ (i * 13)) & 0xFF for i in range(64)],
            dtype=np.float64,
        )

    base = make_multimodal_rows(spark, sf_oracle, n=16).filter(
        F.col("modality") == "image"
    )
    got = {
        r["sample_id"]: r["phash"]
        for r in image_phash(base, decode_cells=fake_decode).collect()
    }
    fallback = {r["sample_id"]: r["phash"] for r in image_phash(base).collect()}
    diffs = 0
    for r in base.collect():
        b = bytes(r["content"])
        assert got[r["sample_id"]] == ahash64(fake_decode(b))
        assert got[r["sample_id"]] == ahash64(ahash_cells(b, fake_decode))
        diffs += got[r["sample_id"]] != fallback[r["sample_id"]]
    assert diffs > 0, "injected decoder never took effect"
    # a decoder that raises degrades to the resample path, never fails
    def broken(_b):
        raise ValueError("not an image")

    broken_out = {
        r["sample_id"]: r["phash"]
        for r in image_phash(base, decode_cells=broken).collect()
    }
    assert broken_out == fallback


def test_image_phash_real_pillow_thumbnail_path(spark):
    """Runs only where Pillow exists (absent in this container, present
    in a real deployment): a synthesized PNG must hash via the REAL 8x8
    grayscale thumbnail — lockstep with a local Pillow+numpy
    re-derivation — and a lightly-edited copy must land hamming-close."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    import numpy as np
    from PIL import Image

    from hadoop_copier_spark.sources.multimodal import (
        _pil_thumb_cells,
        ahash64,
        image_phash,
    )

    def png(seed):
        rng = np.random.RandomState(seed)
        arr = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()

    payloads = [(i, "image", png(i)) for i in range(4)]
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(payloads, 2),
        "sample_id long, modality string, content binary",
    )
    got = {r["sample_id"]: r["phash"] for r in image_phash(df).collect()}
    for sid, _m, b in payloads:
        assert got[sid] == ahash64(_pil_thumb_cells(b))


def test_image_phash_empty_and_null_payloads(spark):
    """Empty/NULL content degrades to phash 0, never a task failure."""
    from hadoop_copier_spark.sources.multimodal import image_phash

    df = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(1, "image", b""), (2, "image", None), (3, "image", b"abc")], 1
        ),
        "sample_id long, modality string, content binary",
    )
    out = {r["sample_id"]: r["phash"] for r in image_phash(df).collect()}
    assert out[1] == 0 and out[2] == 0 and out[3] != 0


def test_csv_malformed_matrix_counts_and_failfast(spark, sf_smoke):
    """xp_csv_malformed pins the parse-mode contract: PERMISSIVE keeps
    all 23 rows and side-channels exactly the 3 planted corruptions;
    DROPMALFORMED's PARSED count is 20 (the uncached count() fast path
    would report 23 — the pitfall the op documents); FAILFAST raises."""
    got = {
        r["check"]: r["n"]
        for r in REGISTRY["xp_csv_malformed"].fn(spark, sf_smoke).collect()
    }
    assert got == {
        "clean_rows": 20,
        "dropmalformed_rows": 20,
        "permissive_corrupt_rows": 3,
        "permissive_rows": 23,
    }
    # FAILFAST on the same planted file must raise on materialization
    from hadoop_copier_spark.queries.base import scratch_dir
    import os

    out = scratch_dir("xp_csv_malformed_ff")
    with open(os.path.join(out, "rows.csv"), "w") as f:
        f.write("id,qty,name\n0,ok_is_not_int,x\n")
    ff = (
        spark.read.option("header", "true")
        .option("mode", "FAILFAST")
        .schema("id INT, qty INT, name STRING")
        .csv(out)
    )
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        ff.cache().count()


def test_avro_capability_seam_is_real(spark, sf_smoke, tmp_path):
    """The source-matrix note (SURVEY / xh_text_roundtrip docstring) says
    avro support requires the external spark-avro module not deployed in
    this container. EXERCISE that claim instead of asserting it in prose:
    writing format('avro') must fail with Spark's own
    external-data-source guidance. If this environment ever gains the
    package, this test fails loudly — the signal to implement the avro
    round-trip and add it to the matrix."""
    df = spark.read.parquet(f"{sf_smoke}/region.parquet")
    try:
        df.write.mode("overwrite").format("avro").save(str(tmp_path / "r.avro"))
    except Exception as e:
        msg = str(e)
        assert "avro" in msg.lower(), msg
        assert "Failed to find" in msg or "external data source" in msg.lower(), msg
    else:  # pragma: no cover - environment gained spark-avro
        raise AssertionError(
            "spark-avro is now deployed: implement the avro round-trip "
            "(xh_text_roundtrip's matrix note is stale)"
        )
