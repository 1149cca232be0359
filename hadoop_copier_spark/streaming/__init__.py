"""Structured Streaming surface (SURVEY §2b streaming rows).

Batch-equivalent H forms live in queries/streaming_batch.py; this package
provides the actual streaming jobs plus deterministic file-replay tooling,
and tests/test_streaming.py asserts stream results == batch results.
"""

from .replay import (  # noqa: F401
    replay_events_chunks,
    replay_events_split,
    replay_events_split_buckets,
    replay_events_time_buckets,
    EVENTS_SCHEMA,
)
from .snapshot_sink import committed_batch_ids, snapshot_batch_writer  # noqa: F401
from .jobs import (  # noqa: F401
    stream_tumbling_counts,
    stream_dedup,
    stream_dedup_within_watermark,
    stream_static_join_counts,
    stream_running_counts,
    stream_stream_join,
    stream_interval_join,
)
from .stateful import running_totals_stateful, subseq_match_stateful  # noqa: F401
