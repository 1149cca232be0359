"""Binary source + multimodal P checks (SURVEY §2b scans-table P rows):
binaryFile metadata vs hashlib ground truth; BinaryType/struct parquet
round-trip; mapInPandas feature extraction determinism."""

import hashlib

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
