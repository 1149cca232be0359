"""Exact-boundary semantics, pinned on micro-fixtures (the q63 failure
class: an engine-boundary rule that no SF fixture happens to exercise
stays silently untested). Each case builds the smallest data that sits ON
the boundary and asserts which side of it each operator lands."""

import datetime as dt
import re

from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(seconds):
    return BASE + dt.timedelta(seconds=seconds)


def test_tumbling_window_boundary_event_starts_new_window(spark):
    """An event at exactly the window edge (t = k*width) belongs to the
    NEW window — window() floors, end-exclusive: [start, end)."""
    df = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(599)), (3, _ts(600))], "id long, ts timestamp"
    )
    rows = (
        df.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .orderBy("w.start")
        .collect()
    )
    assert [r["ids"] for r in rows] == [[1, 2], [3]]


def test_session_window_exact_gap_merges(spark):
    """An event at exactly prev_ts + gap MERGES (inclusive merge test) —
    the rule the q63 oracle got wrong until the sf0.1 sweep caught it."""
    df = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(1800)), (3, _ts(3601))], "id long, ts timestamp"
    )
    rows = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("w.start")
        .collect()
    )
    # 0 and 1800 merge (exact gap); 3601 is 1801 s after 1800 -> new session
    assert [r["n"] for r in rows] == [2, 1]


def test_range_join_between_includes_both_endpoints(spark):
    """BETWEEN is closed on both ends in Spark SQL and ANSI SQL alike; a
    range-join predicate keeps rows sitting exactly on either bound."""
    left = spark.createDataFrame([(1, 10), (2, 20)], "lid long, v long")
    right = spark.createDataFrame([(100, 10, 20)], "rid long, lo long, hi long")
    rows = (
        left.join(right, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi")))
        .select("lid")
        .orderBy("lid")
        .collect()
    )
    assert [r["lid"] for r in rows] == [1, 2]


def test_asof_join_candidate_at_exact_time_is_taken(spark):
    """asof_join is at-or-BEFORE: a right row timestamped exactly at the
    left row's time must be selected over an earlier one."""
    from hadoop_copier_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, "k", _ts(100))], "lid long, k string, lt timestamp")
    right = spark.createDataFrame(
        [(10, "k", _ts(50)), (11, "k", _ts(100)), (12, "k", _ts(101))],
        "rid long, k string, rt timestamp",
    )
    rows = asof_join(left, right, "k", "lt", "rt").select("lid", "rid").collect()
    assert [(r["lid"], r["rid"]) for r in rows] == [(1, 11)]


def test_asof_bucketed_equals_unbucketed_at_boundaries(spark):
    """The (key, time-bucket) equi pre-join (asof_join bucket_width,
    VERDICT r8 #6) is a pure plan transformation: with width >= lookback
    the result is IDENTICAL to the plain lookback form, including the
    boundary candidates the bucketing could plausibly lose — a candidate
    exactly at lt - lookback (inclusive, lives in the PREVIOUS bucket)
    and one just older (excluded by lookback, not by the bucket)."""
    from pyspark.sql import functions as F

    from hadoop_copier_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "k", 100.0), (2, "k", 25.0), (3, "q", 31.0)],
        "lid long, k string, lt double",
    )
    right = spark.createDataFrame(
        [
            (10, "k", 90.0),   # lid 1: exactly lt - lookback, previous bucket -> kept
            (11, "k", 89.0),   # just outside lookback -> dropped by residual
            (12, "k", 25.0),   # lid 2: exact-time match, own bucket
            (13, "q", 24.0),   # lid 3: previous-bucket match
        ],
        "rid long, k string, rt double",
    )
    kwargs = dict(
        on="k", left_time="lt", right_time="rt", tiebreak="rid", how="left",
        lookback=F.lit(10.0),
    )
    plain = asof_join(left, right, **kwargs).select("lid", "rid")
    bucketed = asof_join(
        left, right, bucket_width=10.0, lookback_seconds=10.0, **kwargs
    ).select("lid", "rid")
    got_plain = sorted(tuple(r) for r in plain.collect())
    got_bucketed = sorted(tuple(r) for r in bucketed.collect())
    assert got_plain == got_bucketed == [(1, 10), (2, 12), (3, 13)], (
        got_plain,
        got_bucketed,
    )


def test_asof_bucketed_date_axis(spark):
    """_time_as_seconds' non-numeric branch: a DATE right axis against a
    TIMESTAMP left axis buckets via the date->timestamp->double cast
    chain. 3-day lookback, 3-day buckets: the match exactly at the
    lookback edge (in the previous bucket) is kept, the one just past
    it dropped."""
    import datetime as _dt

    from pyspark.sql import functions as F

    from hadoop_copier_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "k", _dt.datetime(2024, 1, 10, 0, 0))],
        "lid long, k string, lt timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, "k", _dt.date(2024, 1, 7)),  # exactly lt - 3 days -> kept
            (11, "k", _dt.date(2024, 1, 6)),  # outside lookback -> dropped
        ],
        "rid long, k string, rt date",
    )
    rows = asof_join(
        left, right, on="k", left_time="lt", right_time="rt", tiebreak="rid",
        lookback=F.expr("INTERVAL '3' DAY"), bucket_width=3 * 86400.0,
        lookback_seconds=3 * 86400.0,
    ).select("lid", "rid").collect()
    assert [(r["lid"], r["rid"]) for r in rows] == [(1, 10)]


def test_asof_bucket_width_requires_lookback(spark):
    import pytest as _pytest

    from hadoop_copier_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, "k", 1.0)], "lid long, k string, lt double")
    with _pytest.raises(ValueError, match="lookback"):
        asof_join(left, left, on="k", left_time="lt", right_time="lt",
                  bucket_width=10.0)


def test_asof_bucket_width_requires_lookback_seconds(spark):
    """ADVICE r10 (medium): a width narrower than the lookback used to
    silently drop candidates outside the fixed 2-bucket explode. The fix
    makes the explode width explicit: bucket_width without
    lookback_seconds is now a hard error, and the fan-out cap rejects
    absurd width/lookback ratios instead of exploding 1000s of copies."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from hadoop_copier_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, "k", 1.0)], "lid long, k string, lt double")
    with _pytest.raises(ValueError, match="lookback_seconds"):
        asof_join(left, left, on="k", left_time="lt", right_time="lt",
                  lookback=F.lit(10.0), bucket_width=10.0)
    with _pytest.raises(ValueError, match="cap is"):
        asof_join(left, left, on="k", left_time="lt", right_time="lt",
                  lookback=F.lit(1000.0), bucket_width=1.0,
                  lookback_seconds=1000.0)


def test_asof_bucket_narrower_than_lookback_keeps_edge_candidate(spark):
    """The multi-bucket explode (round 11): with W=10 and L=35 the left
    side explodes over ceil(35/10)+1 = 5 buckets, so a candidate exactly
    at lt - L (4 buckets back) is KEPT — the case the old fixed-2-bucket
    form silently lost — and one just outside the lookback is dropped by
    the residual predicate, not the bucketing."""
    from pyspark.sql import functions as F

    from hadoop_copier_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, "k", 100.0)], "lid long, k string, lt double")
    right = spark.createDataFrame(
        [
            (10, "k", 65.0),  # exactly lt - lookback, bucket 6 vs left's 10 -> kept
            (11, "k", 64.0),  # just outside lookback -> dropped by residual
        ],
        "rid long, k string, rt double",
    )
    rows = asof_join(
        left, right, on="k", left_time="lt", right_time="rt", tiebreak="rid",
        lookback=F.lit(35.0), bucket_width=10.0, lookback_seconds=35.0,
    ).select("lid", "rid").collect()
    assert [(r["lid"], r["rid"]) for r in rows] == [(1, 10)]


def test_watermark_boundary_event_at_exact_watermark_kept(spark, tmp_path):
    """Windowed agg drops data strictly OLDER than the watermark; a window
    whose end equals the current watermark is still finalized correctly
    (no premature drop of the boundary window)."""
    import os

    from hadoop_copier_spark.streaming import EVENTS_SCHEMA

    src = str(tmp_path / "wm_src")

    def mk(rows, sub):
        df = spark.createDataFrame(rows, schema=EVENTS_SCHEMA)
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, sub))

    mk([(1, _ts(0), 7, "click", 1.0, "{}")], "b1")
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp("w.start").alias("w0"), "n")
    )
    q = agg.writeStream.outputMode("append").format("memory").queryName("t_wmb").start()
    try:
        q.processAllAvailable()
        # advance watermark to exactly the first window's end + delay:
        # event at t=1200 -> watermark 1200-600=600 == window [0,600) end
        mk([(2, _ts(1200), 7, "click", 1.0, "{}")], "b2")
        q.processAllAvailable()
        # one more nudge well past, to flush anything pending
        mk([(3, _ts(4000), 7, "click", 1.0, "{}")], "b3")
        q.processAllAvailable()
        got = {r["w0"]: r["n"] for r in spark.sql("SELECT * FROM t_wmb").collect()}
    finally:
        q.stop()
    w0 = int(BASE.replace(tzinfo=dt.timezone.utc).timestamp())
    assert got.get(w0) == 1


def test_integer_units_sum_past_2_63_is_loud_never_wrapped(spark):
    """VERDICT r6 #5: the q24 overflow gate, pinned behaviorally. The
    engine's integer-units discipline (aggregates.py q24) accumulates in
    DECIMAL(38,0) — exact to ~1e38 — and only the FINAL per-group value is
    cast BIGINT. Past 2^63 that cast is LOUD: under Spark 4's default ANSI
    mode it raises CAST_OVERFLOW; under legacy non-ANSI it returns NULL.
    Either way the driver's hash gate sees it. What must NEVER happen is a
    silently wrapped (negative) BIGINT shipping as a result."""
    import pyspark.errors

    # two rows of 5e18 e6-units: sum = 1e19 > 2^63-1 (~9.22e18)
    rows = spark.sparkContext.parallelize([(5_000_000_000_000_000_000,)] * 2, 1)
    df = spark.createDataFrame(rows, "e6 long")

    try:
        gated = df.agg(
            F.sum(F.col("e6").cast("decimal(38,0)")).cast("bigint").alias("s")
        ).collect()[0]["s"]
    except pyspark.errors.PySparkException as exc:
        assert "CAST_OVERFLOW" in str(exc)  # ANSI: loud by exception
    else:
        assert gated is None  # non-ANSI: loud by NULL at the hash gate

    # the DECIMAL(38,0) accumulator itself is exact far past 2^63 — the
    # value survives; only the final narrowing is guarded
    exact = df.agg(
        F.sum(F.col("e6").cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]
    assert int(exact) == 10_000_000_000_000_000_000

    # and below the BIGINT ceiling the gate is lossless
    small = spark.createDataFrame(
        spark.sparkContext.parallelize([(3,), (4,)], 1), "e6 long"
    )
    ok = small.agg(
        F.sum(F.col("e6").cast("decimal(38,0)")).cast("bigint").alias("s")
    ).collect()[0]["s"]
    assert ok == 7


def test_quantile_norm_rank_widened_past_int32_overflow_boundary(spark, tmp_path):
    """ADVICE r7 (medium): (rr - 1) * 1000000 with a 32-bit row_number
    overflows INT once any language exceeds 2148 documents (2148 * 1e6 >
    2^31-1) and Spark 4's default ANSI mode turns that into a hard
    ARITHMETIC_OVERFLOW. xh_quantile_norm widens the rank to BIGINT
    BEFORE multiplying, matching DuckDB's implicit promotion.

    VERDICT r8 #3: this test must run the REGISTERED operator, not an
    inline copy of its expression — reverting the widening in
    pipeline_ops.py has to turn this red. So: write a 2200-doc
    single-language documents.parquet fixture (one row PAST the 2148
    boundary) and run REGISTRY['xh_quantile_norm'].fn against it; expect
    pct_ppm 0..1_000_000 monotone, not ARITHMETIC_OVERFLOW."""
    from hadoop_copier_spark.queries import REGISTRY

    n = 2200  # > 2148: an un-widened INT expression raises here under ANSI
    spark.createDataFrame(
        [(i, "en", i + 1) for i in range(n)], "doc_id long, lang string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    out = (
        REGISTRY["xh_quantile_norm"]
        .fn(spark, str(tmp_path))
        .select("doc_id", "pct_ppm")
        .collect()
    )
    assert len(out) == n
    assert out[0]["pct_ppm"] == 0
    assert out[-1]["pct_ppm"] == 1_000_000
    vals = [r["pct_ppm"] for r in out]
    assert vals == sorted(vals)


# ---------------------------------------------------------------------------
# ADVICE r13 width fixes: the sf fixtures (31 token types, 1.5k docs) never
# exercised the BIGINT ceilings in zipf r^2, burstiness VMR, and kappa's
# n^2-order ppm terms. Each test below builds the smallest fixture PAST the
# old 2^63 bound and runs the REGISTERED operator (the quantile_norm
# discipline, VERDICT r8 #3): reverting the DECIMAL(38,0) widening turns
# these red (ANSI ARITHMETIC_OVERFLOW) instead of silently wrapping.
# Expected values are exact Python ints computed from the same formulas.
# ---------------------------------------------------------------------------


def test_zipf_fit_r2_widened_past_int64_boundary(spark, tmp_path):
    """ADVICE r13 (medium): (n*sxy - sx*sy)^2 * 1e6 wraps BIGINT past
    ~1,000 vocabulary types. 1,500 distinct types with distinct counts
    push the squared numerator to ~1.04e19 > 2^63-1; the widened op must
    return the exact truncating-division ppm values."""
    from hadoop_copier_spark.queries import REGISTRY

    n = 1500
    rows = [(i, " ".join([f"t{i:04d}"] * (n - i))) for i in range(n)]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(4).write.parquet(
        str(tmp_path / "documents.parquet")
    )

    # exact expected values (int.bit_length == length(bin(v)) for v > 0)
    cnts = sorted((n - i for i in range(n)), reverse=True)
    xs = [(i + 1).bit_length() for i in range(n)]
    ys = [c.bit_length() for c in cnts]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    nm, dx, dy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    assert nm * nm * 1_000_000 > 2**63 - 1  # fixture actually crosses the bound

    def tdiv(a, b):  # truncate toward zero, the div == // contract
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    got = REGISTRY["xh_zipf_fit"].fn(spark, str(tmp_path)).collect()[0]
    assert got["n_types"] == n
    assert got["slope_ppm"] == tdiv(nm * 1_000_000, dx)
    assert got["r2_ppm"] == tdiv(nm * nm * 1_000_000, dx * dy)


def test_token_burstiness_vmr_widened_past_int64_boundary(spark, tmp_path):
    """ADVICE r13 (low): (n_docs*scc - sc*sc) * 1e6 wraps BIGINT for a
    bursty token. 10 docs x 30,000 copies of one token among 2,000 docs
    push the numerator to ~1.79e19 > 2^63-1."""
    from hadoop_copier_spark.queries import REGISTRY

    rows = [(i, " ".join(["z"] * 30_000)) for i in range(10)]
    rows += [(10 + i, f"f{i:05d}") for i in range(1990)]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(4).write.parquet(
        str(tmp_path / "documents.parquet")
    )

    n_docs, sc, scc = 2000, 10 * 30_000, 10 * 30_000**2
    num = (n_docs * scc - sc * sc) * 1_000_000
    assert num > 2**63 - 1  # fixture actually crosses the bound

    got = {
        r["token"]: r
        for r in REGISTRY["xh_token_burstiness"].fn(spark, str(tmp_path)).collect()
    }
    z = got["z"]
    assert (z["df"], z["total_occurrences"]) == (10, sc)
    assert z["vmr_ppm"] == num // (n_docs * sc)
    f = got["f00000"]  # an even-spread singleton sits just under the Poisson line
    assert (f["df"], f["vmr_ppm"]) == (1, ((n_docs - 1) * 1_000_000) // n_docs)


def test_kappa_langid_widened_past_int64_boundary(spark, tmp_path):
    """ADVICE r13 (low): s = sum(rt*ct) reaches n^2, so s*1e6 and
    (n*tr - s)*1e6 wrap BIGINT at n ~ 3e6 docs (the docstring's old
    ~3e9 figure only bounded the bare rt*ct term). 4.4e6 one-token docs
    in two perfectly-separable languages push s*1e6 to ~9.68e18."""
    from hadoop_copier_spark.queries import REGISTRY

    per_lang = 2_200_000
    (
        spark.range(2 * per_lang)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, F.lit("aa")).otherwise(F.lit("bb")).alias("lang"),
            F.when(F.col("id") % 2 == 0, F.lit("hola")).otherwise(F.lit("hello")).alias("text"),
        )
        .coalesce(8)
        .write.parquet(str(tmp_path / "documents.parquet"))
    )

    n = 2 * per_lang
    s = 2 * per_lang * per_lang  # perfect prediction: s = n1^2 + n2^2
    assert s * 1_000_000 > 2**63 - 1  # fixture actually crosses the bound

    got = REGISTRY["xh_kappa_langid"].fn(spark, str(tmp_path)).collect()[0]
    assert got["n_docs"] == n and got["n_correct"] == n
    assert got["accuracy_ppm"] == 1_000_000
    assert got["expected_ppm"] == (s * 1_000_000) // (n * n)
    assert got["kappa_ppm"] == ((n * n - s) * 1_000_000) // (n * n - s)  # == 1e6


def test_hll_bucket_is_exact_integer_division(spark):
    """ADVICE r13 (low): floor(h / 2^52) goes through a double, which
    loses up to 7 low bits of a 60-bit h — a hash within that error of a
    bucket boundary lands in the wrong register. Demonstrate the
    divergence at an adversarial h and pin that the module derives every
    bucket with exact `div` (no floor-division site remains)."""
    import inspect

    from hadoop_copier_spark.queries import quality_checks as qc

    rem = qc._HLL_REM
    h = 5 * rem - 1  # one below a bucket boundary; rounds UP as a double
    row = (
        spark.createDataFrame([(h,)], "h long")
        .select(
            F.floor(F.col("h") / rem).alias("float_bucket"),
            F.expr(f"h div {rem}").alias("exact_bucket"),
        )
        .collect()[0]
    )
    assert row["float_bucket"] == 5  # the double path misassigns...
    assert row["exact_bucket"] == h // rem == 4  # ...the exact path does not

    # Source audit (ADVICE r14: behavioral pin + a REGEX absence check,
    # not an exact occurrence count that breaks on benign refactors):
    # no float floor-division by _HLL_REM may reappear anywhere — every
    # bucket extraction must be integer `div`.
    # (ADVICE r15: the old `[^)]*` pattern stopped at the `)` inside
    # `F.col("h")` and could never match the canonical offender —
    # tolerate nested parens with a bounded lazy wildcard instead.)
    src = inspect.getsource(qc)
    assert not re.search(r"F\.floor\(.{0,80}?/\s*_HLL_REM", src, re.S)
    assert re.search(r"F\.floor\(.{0,80}?/\s*_HLL_REM",
                     'F.floor(F.col("h") / _HLL_REM)', re.S)  # pattern self-test
    assert 'div {_HLL_REM}' in src  # at least one exact-division site
