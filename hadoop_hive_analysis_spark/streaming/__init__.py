"""Structured Streaming surface: streaming twins of the batch event ops
and of the dedup ingest front door."""

from .dedup import (
    read_documents_stream,
    streaming_dedup_digests,
    streaming_dedup_within_watermark,
)
from .events import (
    events_stream_join_replay,
    read_events_stream,
    rollup_view,
    run_available_now,
    run_incremental_rollup,
    streaming_click_purchase_join,
    streaming_daily_distinct_sketches,
    streaming_session_aggregates,
    streaming_sliding_counts,
    streaming_tumbling_counts,
    streaming_user_running_counts,
)

__all__ = [
    "events_stream_join_replay",
    "read_documents_stream",
    "read_events_stream",
    "streaming_click_purchase_join",
    "rollup_view",
    "run_available_now",
    "run_incremental_rollup",
    "streaming_daily_distinct_sketches",
    "streaming_dedup_digests",
    "streaming_dedup_within_watermark",
    "streaming_session_aggregates",
    "streaming_sliding_counts",
    "streaming_tumbling_counts",
    "streaming_user_running_counts",
]
