"""Structured Streaming surface: streaming twins of the batch event ops."""

from .events import (
    read_events_stream,
    run_available_now,
    streaming_session_aggregates,
    streaming_tumbling_counts,
    streaming_user_running_counts,
)

__all__ = [
    "read_events_stream",
    "run_available_now",
    "streaming_session_aggregates",
    "streaming_tumbling_counts",
    "streaming_user_running_counts",
]
