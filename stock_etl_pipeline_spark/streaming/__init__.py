"""Structured Streaming surface — see pipeline.py."""

from .pipeline import (
    EVENTS_STREAM_SCHEMA,
    dedup_events_within_watermark,
    interval_join_streams,
    read_events_stream,
    run_to_memory,
    sessionize_stream,
    stateful_user_totals,
    stream_merge_upsert,
    tumbling_event_counts,
)

__all__ = [
    "EVENTS_STREAM_SCHEMA",
    "dedup_events_within_watermark",
    "interval_join_streams",
    "read_events_stream",
    "run_to_memory",
    "sessionize_stream",
    "stateful_user_totals",
    "stream_merge_upsert",
    "tumbling_event_counts",
]
