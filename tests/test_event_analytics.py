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
