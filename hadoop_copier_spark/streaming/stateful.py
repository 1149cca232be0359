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
