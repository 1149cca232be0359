"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2b 'Stateful per-key aggregation' P row — the arbitrary-state
path beyond built-in aggregations).

Keeps a running (count, sum) per user across micro-batches and emits the
updated totals each batch. State is a single numeric pair per key — the
smallest possible footprint, so state store size is O(distinct keys)
regardless of event volume (the 100 TB property that matters).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update(key, pdfs, state: GroupState):
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})


def running_totals_stateful(events_stream: DataFrame):
    """events stream -> per-user running (count, sum(value)) via arbitrary
    state. Update mode: each batch emits the keys it touched."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming subsequence matcher (stateful tail buffer per user)
# ---------------------------------------------------------------------------

SSQ_OUT_SCHEMA = "user_id long, anchor_event_id long, dist_u6 long"
# last m-1 (event_id, cents) pairs per user, in arrival order, plus the
# (ts-micros, event_id) of the newest event ever seen — the replay-order
# guard: a batch whose first row sorts BEFORE that mark is out-of-order
# replay and must fail loudly, not corrupt windows silently (ADVICE r7).
SSQ_STATE_SCHEMA = "eids array<long>, vs array<long>, last_ts long, last_eid long"


def _subseq_update(key, pdfs, state: GroupState):
    """Emit the z-normalized distance of every length-m window the moment
    its last event arrives. State is the series TAIL — the last m-1
    (event_id, cents) pairs — so state size is O(m) per user regardless
    of stream length, and each arriving event does O(m) work.

    Arithmetic mirrors queries/event_analytics.xh_subseq_search term for
    term (same summation order, /8.0 exact, math.sqrt correctly rounded,
    floor-quantize) so stream output is BIT-identical to the batch
    operator over the same events — asserted in tests/test_streaming.py.
    Events must arrive per-user time-ordered across batches (the replay
    contract; out-of-order streams would first pass a watermark sorter) —
    ENFORCED: the state carries the newest (ts, event_id) mark and a
    batch sorting before it raises instead of silently mis-windowing."""
    import math

    from hadoop_copier_spark.queries.event_analytics import _SSQ_M, _SSQ_QZ

    eids, vs, last_ts, last_eid = (
        state.get if state.exists else ([], [], None, None)
    )
    eids, vs = list(eids), list(vs)
    n_tail = len(vs)
    # accumulate EVERY chunk first, then sort once: a group's micro-batch
    # rows may arrive as several pandas chunks whose relative order is
    # arbitrary — sorting chunks individually would trust exactly the
    # cross-chunk order the per-chunk sort says cannot be trusted
    rows = []
    for pdf in pdfs:
        pdf = pdf.dropna(subset=["value"])
        rows.extend(
            (
                int(r.ts.value // 1000),  # ts as epoch-micros (exact)
                int(r.event_id),
                int(math.floor(r.value * 100 + 0.5)),
            )
            for r in pdf.itertuples()
        )
    rows.sort(key=lambda t: (t[0], t[1]))
    if rows and last_ts is not None and (rows[0][0], rows[0][1]) < (last_ts, last_eid):
        raise ValueError(
            f"out-of-order replay for user {key[0]}: batch starts at "
            f"(ts_us={rows[0][0]}, event_id={rows[0][1]}) but state has "
            f"already consumed (ts_us={last_ts}, event_id={last_eid}); "
            "the per-user in-order arrival contract is violated"
        )
    out_u, out_a, out_d = [], [], []
    all_e = eids + [e for _, e, _ in rows]
    all_v = vs + [v for _, _, v in rows]
    for end in range(max(n_tail, _SSQ_M - 1), len(all_v)):
        i0 = end - _SSQ_M + 1
        w = all_v[i0 : end + 1]
        total = w[0]
        for x in w[1:]:
            total = total + x
        mu = float(total) / 8.0
        var = None
        for x in w:
            t = (x - mu) * (x - mu)
            var = t if var is None else var + t
        sd = math.sqrt(var / 8.0)
        if not sd > 0.0:
            continue
        dist = None
        for j, x in enumerate(w):
            z = (x - mu) / sd - _SSQ_QZ[j]
            t = z * z
            dist = t if dist is None else dist + t
        out_u.append(key[0])
        out_a.append(all_e[i0])
        out_d.append(int(math.floor(dist * 1000000.0 + 0.5)))
    if rows:
        last_ts, last_eid = rows[-1][0], rows[-1][1]
    state.update(
        (
            all_e[-(_SSQ_M - 1):],
            all_v[-(_SSQ_M - 1):],
            last_ts if last_ts is not None else -(2**62),
            last_eid if last_eid is not None else -(2**62),
        )
    )
    if out_u:
        yield pd.DataFrame(
            {"user_id": out_u, "anchor_event_id": out_a, "dist_u6": out_d}
        )
    else:
        # explicit int64 dtypes: a frame built from empty Python lists
        # would carry float64/object columns against the declared long
        # schema — the fragile Arrow path (ADVICE r7)
        yield pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "anchor_event_id": pd.Series(dtype="int64"),
                "dist_u6": pd.Series(dtype="int64"),
            }
        )


def subseq_match_stateful(events_stream: DataFrame):
    """events stream -> per-user streaming subsequence matcher: every
    complete length-m window's z-normalized distance to the query shape,
    emitted exactly once, as an append stream. The streaming form of
    xh_subseq_search's scan — a shape-anomaly alerting pipeline."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _subseq_update,
        outputStructType=SSQ_OUT_SCHEMA,
        stateStructType=SSQ_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
