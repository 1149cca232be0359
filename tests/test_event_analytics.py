"""Behavioral pins for the event-analytics operators
(queries/event_analytics.py) on crafted inputs — the ordering semantics
the differential oracle cannot falsify because both engines share the
query logic: a funnel stage must only count events STRICTLY AFTER the
previous stage, and cohort offsets must be exact week multiples."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from hadoop_copier_spark.queries import REGISTRY


def _ts(day, hour=0, minute=0, second=0):
    return datetime(2024, 1, day, hour, minute, second)


@pytest.fixture(scope="module")
def crafted_events(spark, tmp_path_factory):
    """Three users exercising the funnel edge cases:
    u1: click BEFORE signup, purchase after — neither may convert;
    u2: clean signup -> click -> purchase — full conversion;
    u3: click at the SAME second as signup — strict '>' excludes it.
    """
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, _ts(1, 9), 1, "click", 1.0, "{}"),
        (2, _ts(1, 10), 1, "signup", 1.0, "{}"),
        (3, _ts(1, 11), 1, "purchase", 1.0, "{}"),
        (4, _ts(1, 9), 2, "signup", 1.0, "{}"),
        (5, _ts(1, 10), 2, "click", 1.0, "{}"),
        (6, _ts(2, 11), 2, "purchase", 1.0, "{}"),
        (7, _ts(1, 9, 0, 30), 3, "signup", 1.0, "{}"),
        (8, _ts(1, 9, 0, 30), 3, "click", 1.0, "{}"),
        # u3 activity two weeks after its first event (cohort offset 2)
        (9, _ts(15, 9), 3, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        schema="event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    root = tmp_path_factory.mktemp("crafted_events")
    df.write.parquet(f"{root}/events.parquet")
    return str(root)


def test_funnel_counts_only_strictly_ordered_stages(spark, crafted_events):
    rows = REGISTRY["xh_event_funnel"].fn(spark, crafted_events).collect()
    # all three signups are on 2024-01-01 -> one output row
    assert len(rows) == 1
    r = rows[0]
    assert r.n_signup == 3
    # only u2's click is strictly after its signup (u1 clicked before,
    # u3 clicked at the same second)
    assert r.n_click_after == 1
    # u1's purchase follows signup but has no qualifying click -> only u2
    assert r.n_purchase_after == 1
    assert r.purchase_ppm == 1000000 // 3


def test_cohort_offsets_are_exact_week_multiples(spark, crafted_events):
    rows = REGISTRY["xh_cohort_retention"].fn(spark, crafted_events).collect()
    # 2024-01-01 is a Monday: all first events land in cohort week 0;
    # u3's Jan-15 view is exactly 2 ISO weeks later.
    offsets = {(r.week_offset): r.n_users for r in rows}
    assert offsets == {0: 3, 2: 1}
    assert len({r.cohort_wk for r in rows}) == 1


def test_ohlc_open_close_tiebreak_by_event_id(spark, crafted_events):
    """u3's signup and click share one second; within a bar the open is
    the lowest (sec, event_id) and the close the highest — pinned by
    giving same-second events distinct values."""
    base = REGISTRY["xh_ohlc_bars"].fn(spark, crafted_events)
    rows = {(r.bar_start, r.event_type): r for r in base.collect()}
    sig = [v for (b, t), v in rows.items() if t == "signup"]
    assert all(r.open_cents == 100 and r.close_cents == 100 for r in sig)
    # every bar: low <= open/close <= high, volume = n * 100 here
    for r in rows.values():
        assert r.low_cents <= r.open_cents <= r.high_cents
        assert r.low_cents <= r.close_cents <= r.high_cents
        assert r.vol_cents == r.n_events * 100


def test_funnel_stage_counts_monotone_on_fixtures(spark, sf_oracle):
    """Funnel algebra: within every signup day, later stages can never
    exceed earlier ones, and the ppm is the exact floor ratio."""
    for r in REGISTRY["xh_event_funnel"].fn(spark, sf_oracle).collect():
        assert r.n_signup >= r.n_click_after >= r.n_purchase_after >= 0
        assert r.purchase_ppm == (r.n_purchase_after * 1000000) // r.n_signup


def test_transition_shares_conserve_per_source(spark, sf_oracle):
    """Each from_type's ppm shares must sum to <= 1M (floor division
    loses at most (n_targets - 1) ppm) and its counts to the exact
    total implied by the shares' denominators."""
    rows = REGISTRY["xh_event_transitions"].fn(spark, sf_oracle).collect()
    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
    assert by_from
    for f, rs in by_from.items():
        tot = sum(r.n for r in rs)
        ppm = sum(r.share_ppm for r in rs)
        assert 1000000 - len(rs) < ppm <= 1000000, (f, ppm)
        for r in rs:
            assert r.share_ppm == (r.n * 1000000) // tot


def test_rfm_quintiles_balance_within_segment(spark, sf_oracle):
    """The exact rank cut ((rank-1)*5 div n + 1) partitions every segment
    into 5 R-score buckets whose sizes differ by at most 1 — the defining
    property of a quintile split (same for F and M by symmetry of the
    formula)."""
    rows = REGISTRY["xh_rfm_segments"].fn(spark, sf_oracle).collect()
    per_seg_r = {}
    for r in rows:
        key = (r.segment, r.r_score)
        per_seg_r[key] = per_seg_r.get(key, 0) + r.n_customers
    segs = {s for s, _ in per_seg_r}
    assert segs
    for s in segs:
        sizes = [per_seg_r.get((s, sc), 0) for sc in range(1, 6)]
        assert max(sizes) - min(sizes) <= 1, (s, sizes)


@pytest.fixture(scope="module")
def planted_series(spark, tmp_path_factory):
    """One user with a noisy series whose MIDDLE 8 events are an affine
    transform (x -> 3x + 7) of the subsequence-search query shape, plus a
    second user with a flat (zero-variance) series."""
    from hadoop_copier_spark.queries.event_analytics import _SSQ_Q

    planted = [3 * q / 100.0 + 7 for q in _SSQ_Q]  # cents -> value units
    noise = [12.5, 3.75, 18.0, 6.25, 9.5, 1.25, 15.75, 4.5]
    series = noise[:4] + planted + noise[4:]
    rows = [
        (i + 1, _ts(1, 9, i), 1, "view", v, "{}")
        for i, v in enumerate(series)
    ]
    rows += [
        (100 + i, _ts(1, 9, i), 2, "view", 5.0, "{}") for i in range(10)
    ]
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        schema="event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    root = tmp_path_factory.mktemp("planted_series")
    df.write.parquet(f"{root}/events.parquet")
    return str(root)


def test_subseq_search_finds_affine_copy_at_distance_zero(spark, planted_series):
    """z-normalization makes the search level- and amplitude-invariant:
    the planted window (3x the query's amplitude, shifted by 7) must rank
    FIRST with quantized distance exactly 0, and the flat user's
    zero-variance windows must be excluded rather than NaN-ranked."""
    top = REGISTRY["xh_subseq_search"].fn(spark, planted_series).collect()
    assert top, "no windows returned"
    best = top[0]
    assert best.user_id == 1 and best.event_id == 5, top[:3]
    assert best.dist_u6 == 0
    assert all(r.user_id != 2 for r in top), "flat windows must be excluded"


@pytest.fixture(scope="module")
def decay_events(spark, tmp_path_factory):
    """Ages relative to the corpus max day (Jan 31): two fresh events,
    one 1-day-old, one 30-days-old (exactly at the cap boundary), all
    of one type; a second type entirely 30+ days stale."""
    rows = [
        (1, _ts(31, 9), 1, "fresh", 1.0, "{}"),
        (2, _ts(31, 10), 2, "fresh", 1.0, "{}"),
        (3, _ts(30, 9), 3, "fresh", 1.0, "{}"),
        (4, _ts(1, 9), 4, "fresh", 1.0, "{}"),     # age 30 == cap
        (5, _ts(1, 9), 5, "stale", 1.0, "{}"),     # age 30
        (6, _ts(2, 9), 6, "stale", 1.0, "{}"),     # age 29
    ]
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2),
        schema="event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    root = tmp_path_factory.mktemp("decay_events")
    df.write.parquet(f"{root}/events.parquet")
    return str(root)


def test_decayed_counts_exact_binary_weights(spark, decay_events):
    """Hand-computed 2^-age sums in 2^-30 units: fresh = 2 + 1/2 + 2^-30,
    stale = 2^-30 + 2^-29; effective_n truncates toward zero."""
    out = {r["event_type"]: r for r in
           REGISTRY["xh_decayed_counts"].fn(spark, decay_events).collect()}
    u = 1 << 30
    assert out["fresh"]["n_events"] == 4
    assert out["fresh"]["decayed_units"] == 2 * u + u // 2 + 1
    assert out["fresh"]["effective_n"] == 2
    assert out["stale"]["n_events"] == 2
    assert out["stale"]["decayed_units"] == 1 + 2
    assert out["stale"]["effective_n"] == 0


def test_k_anonymity_flags_thin_classes(spark, tmp_path_factory):
    """(type, day) classes: A/day1 has 5 distinct users (passes k=5),
    A/day2 has 2 users over 3 rows (violates), B/day1 has 1 user
    (violates) — the summary counts users AND raw rows at risk."""
    rows = (
        [(i, _ts(1, 9), i, "A", 1.0, "{}") for i in range(1, 6)]
        + [(10, _ts(2, 9), 7, "A", 1.0, "{}"),
           (11, _ts(2, 10), 7, "A", 1.0, "{}"),
           (12, _ts(2, 11), 8, "A", 1.0, "{}"),
           (13, _ts(1, 9), 9, "B", 1.0, "{}")]
    )
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2),
        schema="event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    root = tmp_path_factory.mktemp("kanon_events")
    df.write.parquet(f"{root}/events.parquet")
    out = {r["event_type"]: r for r in
           REGISTRY["xh_k_anonymity"].fn(spark, str(root)).collect()}
    a, b = out["A"], out["B"]
    assert (a["n_classes"], a["n_violating"]) == (2, 1)
    assert (a["users_at_risk"], a["rows_at_risk"]) == (2, 3)
    assert a["min_class_users"] == 2
    assert (b["n_classes"], b["n_violating"]) == (1, 1)
    assert (b["users_at_risk"], b["rows_at_risk"]) == (1, 1)
    assert b["min_class_users"] == 1


def test_market_basket_support_and_lift_exact(spark, tmp_path_factory):
    """Hand-computed 3-basket corpus: support counts distinct orders
    (line-item duplicates collapse), lift is the cross-multiplied
    independence ratio, and a never-co-occurring pair emits no row."""
    rows = [
        # (l_orderkey, l_partkey, ...) — minimal lineitem columns used
        (1, 100), (1, 200), (1, 200),   # dup line item: still ONE item
        (2, 100), (2, 200),
        (3, 100), (3, 300),
    ]
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(ok, pk, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
              datetime(2024, 1, 1)) for ok, pk in rows], 2),
        schema="l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber bigint, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )
    root = tmp_path_factory.mktemp("basket")
    df.write.parquet(f"{root}/lineitem.parquet")
    out = {(r["part_a"], r["part_b"]): r for r in
           REGISTRY["xh_market_basket"].fn(spark, str(root)).collect()}
    ab, ac = out[(100, 200)], out[(100, 300)]
    assert (ab["n_both"], ab["n_a"], ab["n_b"]) == (2, 3, 2)
    assert ab["support_ppm"] == 666_666
    assert ab["lift_ppm"] == 1_000_000      # 2*3/(3*2): independent-looking
    assert (ac["n_both"], ac["lift_ppm"]) == (1, 1_000_000)
    assert (200, 300) not in out

    # DECIMAL(38,0) promotion boundary (r12 verdict item): forcing the
    # threshold to the order count (promote_at == n_orders == 3 trips
    # the guard, since n_both*N*1e6 can EQUAL N^2*1e6 at the bound) and
    # far below it must produce row-identical output to the BIGINT path.
    from hadoop_copier_spark.queries.tpch_analogs import _market_basket_frame

    bigint_rows = sorted(
        map(tuple, _market_basket_frame(spark, str(root)).collect())
    )
    for promote_at in (1, 3):
        dec_rows = sorted(
            map(
                tuple,
                _market_basket_frame(
                    spark, str(root), promote_at=promote_at
                ).collect(),
            )
        )
        assert dec_rows == bigint_rows, (promote_at, dec_rows, bigint_rows)


def test_market_basket_prune_is_exact(spark, sf_oracle, monkeypatch):
    """VERDICT r14 #5 (A-priori step-1 prune): with the prune forced ON
    at fixture scale, the result must be row-identical to the exact
    unpruned expansion — the accept condition (>= TOP complete pairs at
    co-count >= t) guarantees the global top-50 survives the prune, and
    the t < 2 fallback is the unpruned plan itself."""
    from hadoop_copier_spark.queries import tpch_analogs as ta

    full = sorted(map(tuple, ta._market_basket_frame(spark, sf_oracle).collect()))
    monkeypatch.setattr(ta, "_BASKET_PRUNE_MIN_ORDERS", 0)
    pruned = sorted(map(tuple, ta._market_basket_frame(spark, sf_oracle).collect()))
    assert pruned == full

    # and the accept/descend machinery itself: on a corpus where the
    # independence estimate overshoots (few qualifying pairs), _top_pairs
    # must still return a frame whose top-TOP equals the exact answer
    items = (
        ta.tbl(spark, sf_oracle, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_orders = items.select("l_orderkey").distinct().count()
    pc = items.groupBy("l_partkey").agg(
        ta.F.count(ta.F.lit(1)).alias("n_part")
    ).localCheckpoint(eager=True)
    got = (
        ta._top_pairs(items, pc, n_orders, ta._BASKET_TOP)
        .orderBy(ta.F.col("n_both").desc(), "part_a", "part_b")
        .limit(ta._BASKET_TOP)
        .collect()
    )
    want = (
        ta._pair_counts(items)
        .orderBy(ta.F.col("n_both").desc(), "part_a", "part_b")
        .limit(ta._BASKET_TOP)
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_t_closeness_flags_point_mass_class(spark, tmp_path_factory):
    """Class A/day1 is a point mass on sensitive value 'x' while the
    global distribution is 50/25/25 over x/y/z -> TVD = 0.5, flagged at
    t = 0.30; class A/day2 (uniform over x/y/z, 10 each) lands at
    ~0.167, unflagged. Expected values recomputed in pure Python with
    the same truncating-ppm algebra (zero cells included)."""
    rows = []
    eid = 0
    # day 1: 10 rows, all sensitive 'x'
    for _ in range(10):
        eid += 1
        rows.append((eid, _ts(1, 9), eid, "A", 1.0, '{"k": "x"}'))
    # day 2: 10 each of x / y / z
    for sv in ("x", "y", "z"):
        for _ in range(10):
            eid += 1
            rows.append((eid, _ts(2, 9), eid, "A", 1.0, f'{{"k": "{sv}"}}'))
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2),
        schema="event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    root = tmp_path_factory.mktemp("tclose_events")
    df.write.parquet(f"{root}/events.parquet")

    # brute-force recount with the identical integer-ppm algebra
    from collections import Counter
    cells = Counter()
    for _, ts, _, et, _, props in rows:
        sv = props.split('"k": "')[1].split('"')[0]
        cells[(et, ts.day, sv)] += 1
    gl = Counter()
    for (et, day, sv), c in cells.items():
        gl[sv] += c
    n_tot = sum(gl.values())
    g_ppm = {sv: g * 1_000_000 // n_tot for sv, g in gl.items()}
    g_total = sum(g_ppm.values())
    expect_tvd = {}
    for cls in {(et, day) for et, day, _ in cells}:
        n_cls = sum(c for (et, day, sv), c in cells.items()
                    if (et, day) == cls)
        s = sum(
            abs(c * 1_000_000 // n_cls - g_ppm[sv]) - g_ppm[sv]
            for (et, day, sv), c in cells.items() if (et, day) == cls
        )
        expect_tvd[cls] = (s + g_total) // 2

    out = {r["event_type"]: r for r in
           REGISTRY["xh_t_closeness"].fn(spark, str(root)).collect()}
    a = out["A"]
    assert a["n_classes"] == 2
    assert a["n_violating"] == 1          # only the point-mass class
    assert a["rows_at_risk"] == 10
    assert a["max_tvd_ppm"] == max(expect_tvd.values()) == 500000
    assert min(expect_tvd.values()) < 300000  # day2 stays below t


def test_autocorr_daily_alternating_series_and_calendar_gap(spark,
                                                            tmp_path_factory):
    """A strict period-2 count series (1,3,1,3,...) over 10 consecutive
    days: lag-1 r = -1, lag-2 r = +1 exactly. Every (n, sx, sy, sxy,
    sxx, syy) moment matches a pure-Python recount, and removing a day
    would drop pairs by CALENDAR match (verified by the recount using
    day arithmetic, not series index)."""
    rows, eid = [], 0
    counts = {}
    for d in range(1, 11):
        c = 1 if d % 2 else 3
        counts[d] = c
        for _ in range(c):
            eid += 1
            rows.append((eid, _ts(d, 12), eid, "A", 1.0, "{}"))
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2),
        schema="event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    root = tmp_path_factory.mktemp("acf_events")
    df.write.parquet(f"{root}/events.parquet")

    import math
    expect = {}
    for lag in range(1, 8):
        pairs = [(counts[d], counts[d + lag])
                 for d in counts if (d + lag) in counts]
        n = len(pairs)
        sx = sum(x for x, _ in pairs); sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs); syy = sum(y * y for _, y in pairs)
        num = float(n) * float(sxy) - float(sx) * float(sy)
        den = (float(n) * float(sxx) - float(sx) * float(sx)) * (
            float(n) * float(syy) - float(sy) * float(sy))
        r = num / math.sqrt(den) if den > 0 else None
        expect[lag] = (n, sx, sy, sxy, sxx, syy, r)

    out = REGISTRY["xh_autocorr_daily"].fn(spark, str(root)).collect()
    got = {r["lag"]: (r["n_pairs"], r["sx"], r["sy"], r["sxy"],
                      r["sxx"], r["syy"], r["acf"]) for r in out}
    assert got == expect
    assert got[1][6] == -1.0 and got[2][6] == 1.0


def test_cusum_changepoint_level_shift(spark, tmp_path_factory):
    """10 days at 2 events/day then 10 days at 8/day: the scaled CUSUM
    S_t = sum(N*c - T) is monotone decreasing through the low regime, so
    |S| peaks exactly at the shift boundary (day 10) and the top-5 days
    cluster around it. Full top-5 recomputed in pure Python."""
    rows, eid = [], 0
    counts = {}
    for d in range(1, 21):
        c = 2 if d <= 10 else 8
        counts[d] = c
        for _ in range(c):
            eid += 1
            rows.append((eid, _ts(d, 12), eid, "A", 1.0, "{}"))
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2),
        schema="event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    root = tmp_path_factory.mktemp("cusum_events")
    df.write.parquet(f"{root}/events.parquet")

    n, t = len(counts), sum(counts.values())
    s, cum = {}, 0
    for d in sorted(counts):
        cum += n * counts[d] - t
        s[d] = cum
    expect = sorted(s.items(), key=lambda kv: (-abs(kv[1]), kv[0]))[:5]

    out = REGISTRY["xh_cusum_changepoint"].fn(spark, str(root)).collect()
    got = [(r["day"].day, r["cusum_scaled"]) for r in out]
    assert got == expect
    assert got[0][0] == 10  # the peak sits on the shift boundary
    assert all(r["n_days"] == n and r["total_events"] == t for r in out)


def test_subseq_blocked_equals_plain_across_boundaries(spark, tmp_path):
    """Round 18: the overlapped row-blocking path must produce the
    IDENTICAL candidate-window set as the per-user window path, down to
    block boundaries. Fixture: one hot user with 100 events crossing
    many blocks at block_rows=8 (the minimum legal: m-1=7 overlap rows)
    AND a tiny block_span that splits the series into uneven time
    blocks, plus a second user as a collision check. Every length-8 run
    crossing a row-block boundary must still surface — compared as full
    window sets (pre-top-k), then as the registered query's top-20."""
    import datetime

    from hadoop_copier_spark.queries.event_analytics import (
        _SSQ_M,
        _ssq_blocked_windows,
        _ssq_distance_topk,
    )
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    rng_vals = [((i * 37) % 101) / 7.0 + (i % 9) for i in range(100)]
    for i, v in enumerate(rng_vals):
        # bursty timestamps: 0-4 events per second -> uneven time blocks
        rows.append(
            (i, t0 + datetime.timedelta(seconds=i // 3, microseconds=i), 1,
             "tick", float(v), "{}")
        )
    for i in range(30):
        rows.append(
            (1000 + i, t0 + datetime.timedelta(seconds=i * 2), 2,
             "tick", float((i * 13) % 17), "{}")
        )
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 4),
        schema="event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    root = tmp_path / "subseq_blocked"
    df.write.parquet(f"{root}/events.parquet")

    e = spark.read.parquet(f"{root}/events.parquet").filter(
        F.col("value").isNotNull()
    )
    from hadoop_copier_spark.queries.base import cents

    win = W.partitionBy("user_id").orderBy("ts", "event_id")
    v = cents("value")
    plain = (
        e.select(
            "user_id", "event_id", v.alias("v0"),
            *[F.lead(v, i).over(win).alias(f"v{i}") for i in range(1, _SSQ_M)],
        )
        .filter(F.col(f"v{_SSQ_M - 1}").isNotNull())
    )
    blocked = _ssq_blocked_windows(e, block_span_sec=5, block_rows=8)
    key = lambda r: (r["user_id"], r["event_id"])
    p = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, blocked.collect()))
    assert p == b and len(p) == (100 - 7) + (30 - 7)

    top_plain = _ssq_distance_topk(plain).collect()
    top_blocked = _ssq_distance_topk(blocked).collect()
    assert list(map(tuple, top_plain)) == list(map(tuple, top_blocked))

    # registered query vs its twin on the same fixture
    got_a = REGISTRY["xh_subseq_search"].fn(spark, str(root)).collect()
    got_b = REGISTRY["xh_subseq_blocked"].fn(spark, str(root)).collect()
    assert list(map(tuple, got_a)) == list(map(tuple, got_b))


def test_subseq_blocked_rejects_undersized_blocks(spark, sf_oracle):
    """block_rows < m-1 would let a window span three row-blocks and
    silently vanish — the helper must refuse, not approximate."""
    import pytest
    from pyspark.sql import functions as F

    from hadoop_copier_spark.queries.event_analytics import (
        _ssq_blocked_windows,
    )

    e = spark.read.parquet(f"{sf_oracle}/events.parquet").filter(
        F.col("value").isNotNull()
    )
    with pytest.raises(AssertionError):
        _ssq_blocked_windows(e, block_span_sec=86400, block_rows=6)
