"""Broadcast Bloom-filter pruning (operators/bloom.py, round 12 —
finishes VERDICT r11 #2: the module is now registered, tested, and
plan-pinned instead of dead code)."""

import pyspark.sql.functions as F
import pytest

from hadoop_copier_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
    bloom_position_sql,
)
from hadoop_copier_spark.queries import REGISTRY


def _bloom_for(spark, keys, m_bits=1024, k=3):
    dim = spark.createDataFrame([(int(x),) for x in keys], "key long")
    return bloom_build(spark, dim, "key", m_bits=m_bits, k=k)


def test_no_false_negatives_and_bounded_false_positives(spark):
    """Every member passes (the filter's defining guarantee); the
    non-member pass rate stays near the analytic (1-e^{-kn/m})^k."""
    members = list(range(100))
    probes = spark.range(2000).select(F.col("id").alias("key"))
    bloom = _bloom_for(spark, members, m_bits=4096, k=3)
    flagged = probes.join(F.broadcast(bloom)).select(
        "key", bloom_probe(F.col("bloom"), F.col("key"), 4096, 3).alias("p")
    )
    rows = {r["key"]: r["p"] for r in flagged.collect()}
    assert all(rows[m] for m in members), "false negative — forbidden"
    fp = sum(1 for kk, v in rows.items() if v and kk >= 100)
    # analytic rate ~ (1-e^{-300/4096})^3 ~ 3.6e-4 over 1900 non-members
    # => expect ~1; generous ceiling still catches a broken probe (which
    # would pass ~everything or ~nothing)
    assert fp <= 40, f"false-positive rate implausibly high: {fp}/1900"


def test_prune_filter_drops_guaranteed_nonmatches(spark):
    """The intended use: fact.filter(bloom_probe(...)) keeps every true
    match and removes (most) non-matches BEFORE the real join."""
    bloom = _bloom_for(spark, [5, 6, 7], m_bits=1024, k=3)
    fact = spark.range(1000).select(F.col("id").alias("key"))
    kept = (
        fact.join(F.broadcast(bloom))
        .filter(bloom_probe(F.col("bloom"), F.col("key"), 1024, 3))
        .select("key")
    )
    got = {r["key"] for r in kept.collect()}
    assert {5, 6, 7} <= got
    assert len(got) < 100  # pruned the vast majority


def test_null_key_probes_false(spark):
    bloom = _bloom_for(spark, [1], m_bits=1024, k=3)
    row = (
        spark.createDataFrame([(None,)], "key long")
        .join(F.broadcast(bloom))
        .select(bloom_probe(F.col("bloom"), F.col("key"), 1024, 3).alias("p"))
        .collect()
    )
    assert row[0]["p"] is False


def test_empty_key_set_probes_all_false(spark):
    bloom = _bloom_for(spark, [], m_bits=1024, k=3)
    n = (
        spark.range(50)
        .select(F.col("id").alias("key"))
        .join(F.broadcast(bloom))
        .filter(bloom_probe(F.col("bloom"), F.col("key"), 1024, 3))
        .count()
    )
    assert n == 0


def test_m_bits_must_align_to_words(spark):
    dim = spark.createDataFrame([(1,)], "key long")
    with pytest.raises(ValueError):
        bloom_build(spark, dim, "key", m_bits=100)


def test_duckdb_rebuilds_identical_positions(spark, duck):
    """bloom_position_sql is the single generator feeding both engines:
    the k positions for a sample of keys must agree exactly."""
    keys = [0, 1, 7, 123456789, 2**40 + 3]
    for i in range(3):
        sql_vals = [
            duck.execute(
                "SELECT " + bloom_position_sql(str(kk), i, 4096)
            ).fetchone()[0]
            for kk in keys
        ]
        from hadoop_copier_spark.operators.bloom import _position

        spark_vals = [
            r[0]
            for r in spark.createDataFrame([(kk,) for kk in keys], "key long")
            .select(_position(F.col("key"), i, 4096))
            .collect()
        ]
        assert sql_vals == spark_vals


def test_probe_stays_jvm_side_and_fact_never_shuffles(spark, sf_oracle):
    """Plan pin (VERDICT r11 #2): the probe is pure JVM expression work —
    no Python eval anywhere — and the orders fact side reaches its
    aggregate without ever exchanging on its key; the only nested loop is
    the provably-1-row bitmap attach."""
    from hadoop_copier_spark.plans import explain_str

    text = explain_str(REGISTRY["xh_bloom_prune"].fn(spark, sf_oracle), "simple")
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text
    assert "hashpartitioning(o_custkey" not in text
    assert "BroadcastNestedLoopJoin" in text  # the 1-row bitmap attach
