"""Non-vacuous pins for the data-quality operators
(queries/quality_checks.py): the driver fixtures are clean, so the
profile's all-zero result would also pass against a battery of no-op
checks. Corrupting a copy of the tables and watching EVERY check fire
proves each constraint actually detects its violation class."""

import shutil

import pytest
from pyspark.sql import functions as F

from hadoop_copier_spark.queries import REGISTRY
from hadoop_copier_spark.tables import load_table


def test_dq_profile_clean_fixtures_all_zero(spark, sf_smoke):
    rows = {r.chk: r.n_violations for r in REGISTRY["xh_dq_profile"].fn(spark, sf_smoke).collect()}
    assert len(rows) == 7
    assert all(v == 0 for v in rows.values()), rows


@pytest.fixture(scope="module")
def corrupted_dir(spark, sf_smoke, tmp_path_factory):
    """A copy of the four profiled tables with one planted violation per
    check class."""
    root = str(tmp_path_factory.mktemp("dq_corrupt"))

    o = load_table(spark, sf_smoke, "orders")
    first = o.orderBy("o_orderkey").limit(1)
    o_bad = (
        o.unionByName(first)  # duplicate PK row
        .unionByName(
            first.withColumn("o_orderkey", F.lit(10**12))
            .withColumn("o_orderstatus", F.lit("X"))  # bad domain
        )
    )
    o_bad.write.parquet(f"{root}/orders.parquet")

    li = load_table(spark, sf_smoke, "lineitem")
    li_first = li.orderBy("l_orderkey", "l_linenumber").limit(1)
    li_bad = (
        li.unionByName(li_first.withColumn("l_orderkey", F.lit(10**13)))  # orphan FK
        .unionByName(li_first.withColumn("l_quantity", F.lit(0.0)))  # bad qty
        .unionByName(
            li_first.withColumn("l_orderkey", F.lit(None).cast("long"))  # NULL FK
        )
    )
    li_bad.write.parquet(f"{root}/lineitem.parquet")

    c = load_table(spark, sf_smoke, "customer")
    c_bad = c.unionByName(
        c.orderBy("c_custkey")
        .limit(1)
        .withColumn("c_custkey", F.lit(10**12))
        .withColumn("c_acctbal", F.lit(None).cast("double"))
    )
    c_bad.write.parquet(f"{root}/customer.parquet")

    d = load_table(spark, sf_smoke, "documents")
    d_bad = d.unionByName(
        d.orderBy("doc_id")
        .limit(1)
        .withColumn("doc_id", F.lit(10**12))
        .withColumn("n_chars", F.col("n_chars") + 7)  # derived-col drift
    )
    d_bad.write.parquet(f"{root}/documents.parquet")

    yield root
    shutil.rmtree(root, ignore_errors=True)


def test_dq_profile_every_check_fires(spark, corrupted_dir):
    rows = {r.chk: r.n_violations for r in REGISTRY["xh_dq_profile"].fn(spark, corrupted_dir).collect()}
    assert rows == {
        "customer_null_acctbal": 1,
        "documents_nchars_mismatch": 1,
        "lineitem_nonpositive_qty": 1,
        # the NULL-FK row is counted by its own check, NOT as an orphan
        # (NULL-key semantics differ between anti-join and NOT IN, so
        # the profile keeps the classes disjoint)
        "lineitem_null_orderkey": 1,
        "lineitem_orphan_orderkey": 1,
        "orders_bad_status_domain": 1,
        # one extra row over an existing key (the planted bad-domain row
        # uses a fresh key, so it is not a duplicate)
        "orders_dup_pk_rows": 1,
    }, rows


def test_schema_evolution_merges_and_backfills(spark, sf_smoke):
    df = REGISTRY["xp_schema_evolution"].fn(spark, sf_smoke)
    assert "ingest_batch" in df.columns
    rows = df.collect()
    n = load_table(spark, sf_smoke, "nation").count()
    assert len(rows) == 2 * n  # both schema generations read back
    batches = {r.ingest_batch for r in rows}
    assert batches == {None, 2}  # v1 rows NULL-backfilled, v2 rows tagged


def test_dynamic_partition_overwrite_touches_only_written_partition(
    spark, sf_smoke
):
    """The restated 'F' partition doubles its totalprice; every other
    status partition survives the overwrite untouched, and no rows are
    lost — the behavior that makes partition-level restatement safe on a
    100 TB table."""
    out = REGISTRY["xp_dynamic_partition_overwrite"].fn(spark, sf_smoke)
    orig = load_table(spark, sf_smoke, "orders")
    assert out.count() == orig.count()
    o = {r.o_orderkey: r for r in orig.collect()}
    for r in out.collect():
        base = o[r.o_orderkey]
        if r.o_orderstatus == "F":
            assert abs(r.o_totalprice - 2 * base.o_totalprice) < 1e-9
        else:
            assert r.o_totalprice == base.o_totalprice


def test_observed_metrics_match_direct_aggregates(spark, sf_smoke):
    """The Observation's metrics (collected inside the transform's own
    job) must equal a directly-computed aggregate over the same filter —
    and the plan must contain the CollectMetrics node, not a second
    scan-side aggregate."""
    from hadoop_copier_spark.operators.observe import (
        observed_enriched_lineitem,
    )
    from hadoop_copier_spark.queries.base import cents

    df, obs = observed_enriched_lineitem(spark, sf_smoke)
    assert "CollectMetrics" in df._jdf.queryExecution().optimizedPlan().toString()
    df.collect()  # the action that materializes the metrics
    got = obs.get
    li = load_table(spark, sf_smoke, "lineitem").filter(
        F.col("l_discount") >= 0.02
    )
    want = li.agg(
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(cents("l_extendedprice")).alias("sum_price_cents"),
        F.count(F.when(F.col("l_quantity").isNull(), 1)).alias("null_qty"),
    ).collect()[0]
    assert got["rows_in"] == want.rows_in > 0
    assert got["sum_price_cents"] == want.sum_price_cents
    assert got["null_qty"] == want.null_qty == 0


def test_ingest_provenance_conserves_rows(spark, sf_smoke):
    """xp_ingest_provenance: per-(partition, file) accounting must
    conserve the source exactly — file totals sum to the table count and
    every status partition appears."""
    prov = REGISTRY["xp_ingest_provenance"].fn(spark, sf_smoke).collect()
    o = load_table(spark, sf_smoke, "orders")
    want = {
        (r.o_orderstatus, r.n): None
        for r in o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {(r.o_orderstatus, r.n_rows) for r in prov} == set(want)
    assert all(r.n_files >= 1 for r in prov)
    assert sum(r.n_rows for r in prov) == o.count()


def test_corrupt_record_isolation_accounts_for_every_line(spark, sf_smoke):
    """xp_corrupt_record_isolation: PERMISSIVE ingest must quarantine
    exactly the two planted corrupt lines, parse every valid one, and
    lose nothing."""
    rows = {
        r.status: r
        for r in REGISTRY["xp_corrupt_record_isolation"].fn(spark, sf_smoke).collect()
    }
    n_nation = load_table(spark, sf_smoke, "nation").count()
    assert rows["corrupt"].n_rows == 2
    assert rows["corrupt"].n_parsed_keys == 0
    assert rows["good"].n_rows == n_nation
    assert rows["good"].n_parsed_keys == n_nation


def test_source_gini_planted_skew(spark):
    """The fixture's sources are uniform (gini 0), so prove the math on a
    planted skewed corpus against a hand-computed exact Gini."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hadoop_copier_spark.queries import REGISTRY

    # sources a..e with 1, 1, 2, 6, 10 docs
    counts = {"a": 1, "b": 1, "c": 2, "d": 6, "e": 10}
    rows, did = [], 0
    for s, k in counts.items():
        for _ in range(k):
            rows.append((did, f"text {did}", "en", s, 10))
            did += 1
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 3),
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    xs = sorted(counts.values())
    n, sx = len(xs), sum(xs)
    num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
    want = 1_000_000 * num // (n * sx)
    tmp = tempfile.mkdtemp()
    try:
        df.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        got = REGISTRY["xh_source_gini"].fn(spark, tmp).collect()[0]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert (got["gini_ppm"], got["n_sources"], got["n_docs"]) == (want, n, sx)
    assert got["gini_ppm"] > 300_000  # visibly concentrated


def test_robust_stats_planted_outliers(spark):
    """MAD cut flags exactly the planted heavy-tail docs: 20 docs at
    ~100 chars, 2 at 10000 — mean-based z would drag the cutoff, the
    median/MAD cut must flag exactly the two."""
    import os
    import shutil
    import tempfile

    from hadoop_copier_spark.queries import REGISTRY

    rows = [(i, "t", "en", "s", 100 + (i % 5)) for i in range(20)]
    rows += [(100, "t", "en", "s", 10_000), (101, "t", "en", "s", 10_000)]
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 3),
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    tmp = tempfile.mkdtemp()
    try:
        df.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        got = REGISTRY["xh_robust_stats"].fn(spark, tmp).collect()[0]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert got["n_docs"] == 22
    assert got["n_outliers"] == 2, got
    # median in 2x units stays in the planted bulk's range
    assert 200 <= got["med_x2"] <= 210


def test_ks_drift_planted_distributions(spark):
    """KS statistic: ~0 for identical even/odd distributions, large when
    the halves are disjoint; exact value checked against a hand-computed
    ECDF max on a small planted corpus."""
    import os
    import shutil
    import tempfile

    from hadoop_copier_spark.queries import REGISTRY

    def run(rows):
        df = spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 3),
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        tmp = tempfile.mkdtemp()
        try:
            df.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
            return REGISTRY["xh_ks_drift"].fn(spark, tmp).collect()[0]
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    # identical halves: even ids and odd ids see the same lengths
    same = [(i, "t", "en", "s", 100 + (i // 2) % 5) for i in range(40)]
    r = run(same)
    assert r["ks_ppm"] == 0 and r["n_a"] == r["n_b"] == 20

    # disjoint halves: evens short, odds long -> D = 1.0
    disjoint = [(i, "t", "en", "s", 100 if i % 2 == 0 else 900) for i in range(40)]
    r = run(disjoint)
    assert r["ks_ppm"] == 1_000_000, r

    # hand-computed partial overlap: evens {1,1,2,2}, odds {2,2,3,3}
    lens = {0: 1, 2: 1, 4: 2, 6: 2, 1: 2, 3: 2, 5: 3, 7: 3}
    partial = [(i, "t", "en", "s", lens[i]) for i in range(8)]
    r = run(partial)
    # F_a = {1: .5, 2: 1, 3: 1}; F_b = {1: 0, 2: .5, 3: 1}; D = .5
    assert r["ks_ppm"] == 500_000, r


def test_ks_drift_packing_fallback_matches_packed_path(spark):
    """The ECDF packing bound is guarded, not assumed (r12 ADVICE): when
    a half total reaches the packing radix, _ks_two_sample must switch to
    two unpacked prefix passes and produce IDENTICAL values. Driving
    pack_k below the data size forces the fallback on a small corpus —
    including totals that would corrupt a radix-4 packing (cumB up to 13
    >= pack_k) — and an adversarial boundary case sits exactly AT the
    radix (max(n_a, n_b) == pack_k triggers the fallback, since a
    cumulative count may equal the total)."""
    from hadoop_copier_spark.queries.quality_checks import _ks_two_sample

    rows = [(i % 2, (17 * i) % 7) for i in range(25)]  # n_a=13, n_b=12
    d = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 3), "grp long, v long"
    )
    packed = _ks_two_sample(spark, d, "v").collect()[0]  # default radix
    for k in (4, 13):  # far below the totals; exactly AT max(n_a, n_b)
        fb = _ks_two_sample(spark, d, "v", pack_k=k).collect()[0]
        assert fb == packed, (k, fb, packed)
    # sanity: 14 > both totals -> packed path, same values again
    assert _ks_two_sample(spark, d, "v", pack_k=14).collect()[0] == packed


def test_hll_registers_match_python_reference(spark, sf_smoke):
    """The 256 HLL registers equal an independent Python recomputation
    from hashlib.md5 — pinning the bucket/rho decomposition itself, not
    just Spark-vs-DuckDB agreement (both could share a bug)."""
    import hashlib

    import pyarrow.parquet as pq

    from hadoop_copier_spark.queries import REGISTRY

    texts = pq.read_table(f"{sf_smoke}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    want = [0] * 256
    seen = set()
    for t in texts:
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        seen.add(h)
        bucket, rem = h >> 52, h & ((1 << 52) - 1)
        rho = 53 - rem.bit_length() if rem else 53
        want[bucket] = max(want[bucket], rho)

    row = REGISTRY["xh_hll_registers"].fn(spark, sf_smoke).collect()[0]
    assert [int(x) for x in row["registers"].split(",")] == want
    assert row["n_distinct_exact"] == len(seen)
    assert row["v_zero_registers"] == sum(1 for r in want if r == 0)
    assert row["sum_units"] == sum(1 << (53 - r) for r in want)
    # raw estimate reproducible from the registers in pure Python
    est = (0.7213 / (1.0 + 1.079 / 256) * 256 * 256) / (
        row["sum_units"] / 9007199254740992.0
    )
    assert row["hll_raw_estimate"] == est


def test_hll_union_is_register_max(spark, sf_smoke):
    """The defining distributed-merge property: registers of a corpus
    union equal the elementwise max of per-shard registers — why the
    operator emits registers (mergeable state), not just an estimate."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hadoop_copier_spark.queries import REGISTRY

    fn = REGISTRY["xh_hll_registers"].fn
    full = [int(x) for x in fn(spark, sf_smoke).collect()[0]["registers"].split(",")]

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    tmp = tempfile.mkdtemp()
    try:
        shards = []
        for i, pred in enumerate([F.col("doc_id") % 2 == 0, F.col("doc_id") % 2 == 1]):
            sd = os.path.join(tmp, f"shard{i}")
            docs.filter(pred).write.mode("overwrite").parquet(
                os.path.join(sd, "documents.parquet")
            )
            shards.append(
                [int(x) for x in fn(spark, sd).collect()[0]["registers"].split(",")]
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert [max(a, b) for a, b in zip(*shards)] == full


def test_cms_point_query_and_mergeability(spark, tmp_path):
    """The two properties a Count-Min Sketch exists for:
    (1) point-query guarantee — for EVERY token, est = min over rows of
        reg[row][h_row(token)] is >= the exact count (counters only ever
        add, so the min can overestimate via collisions but never
        undercount);
    (2) mergeable state — the sketch of a union corpus equals the
        POINTWISE SUM of the per-shard sketches (the property that lets
        1000 executors emit 256-counter frames and merge on the driver).
    Exactness of the registers themselves is the DuckDB oracle's job."""
    import collections
    import hashlib
    import os
    import re

    from hadoop_copier_spark.queries import REGISTRY

    def write_docs(rows, name):
        d = str(tmp_path / name)
        spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 2),
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        return d

    def sketch(sf_dir):
        reg = {}
        for r in REGISTRY["xh_cms_registers"].fn(spark, sf_dir).collect():
            reg[(r["row_id"], r["bucket"])] = r["cnt"]
        return reg

    def h(j, tok):
        return int(hashlib.md5(f"{j}:{tok}".encode()).hexdigest()[:15], 16) % 64

    texts_a = ["the cat sat", "the the the heavy heavy token", "cat dog"]
    texts_b = ["dog dog dog", "heavy token again", "entirely new words here"]
    a = write_docs([(i, t, "en", "s", len(t)) for i, t in enumerate(texts_a)], "a")
    b = write_docs([(i, t, "en", "s", len(t)) for i, t in enumerate(texts_b)], "b")
    u = write_docs(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts_a + texts_b)], "u"
    )
    reg_a, reg_b, reg_u = sketch(a), sketch(b), sketch(u)
    assert len(reg_u) == 4 * 64

    # (2) merge = pointwise addition
    assert all(
        reg_u[k] == reg_a[k] + reg_b[k] for k in reg_u
    ), "union sketch != sum of shard sketches"

    # (1) point query >= exact for every token in the union corpus
    exact = collections.Counter(
        tok
        for t in texts_a + texts_b
        for tok in re.split(r"\s+", t.lower())
        if tok
    )
    total = sum(exact.values())
    assert sum(reg_u[(0, bkt)] for bkt in range(64)) == total  # row conserves
    for tok, n in exact.items():
        est = min(reg_u[(j, h(j, tok))] for j in range(4))
        assert est >= n, (tok, est, n)
    # the heaviest planted token's estimate is exact here (no collision
    # materialized in this tiny corpus for at least one of its 4 rows)
    assert min(reg_u[(j, h(j, "the"))] for j in range(4)) >= exact["the"] == 4


def test_benford_planted_digits_and_missing_digit(spark, tmp_path):
    """Constructed price corpus: 30 prices leading with 1, 17 with 2,
    5 with 5 — digits 3,4,6,7,8,9 absent. The audit must densify absent
    digits to n_rows = 0 (dev = the full Benford expectation) and
    reproduce a pure-Python truncating-ppm recount for the present
    ones, including a sub-1.00 price whose first CENTS digit leads."""
    import decimal
    prices = (
        [decimal.Decimal("123.45")] * 29 + [decimal.Decimal("0.19")]  # digit 1
        + [decimal.Decimal("2999.99")] * 17                           # digit 2
        + [decimal.Decimal("55.00")] * 5                              # digit 5
    )
    df = spark.createDataFrame(
        spark.sparkContext.parallelize([(p,) for p in prices], 2),
        "l_extendedprice decimal(12,2)",
    )
    root = str(tmp_path / "benford")
    df.write.parquet(f"{root}/lineitem.parquet")

    n_tot = len(prices)
    counts = {1: 30, 2: 17, 5: 5}
    exp_ppm = {1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
               6: 66946, 7: 57991, 8: 51152, 9: 45757}
    out = {r["digit"]: r for r in
           REGISTRY["xh_benford"].fn(spark, root).collect()}
    assert sorted(out) == list(range(1, 10))
    for d in range(1, 10):
        n = counts.get(d, 0)
        obs = n * 1_000_000 // n_tot
        assert out[d]["n_rows"] == n
        assert out[d]["obs_ppm"] == obs
        assert out[d]["exp_ppm"] == exp_ppm[d]
        assert out[d]["dev_ppm"] == abs(obs - exp_ppm[d])
