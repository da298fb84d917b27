"""Structured Streaming surface — see pipeline.py; lateness/freshness
observability in metrics.py."""

from .metrics import (
    freshness_report,
    lateness_listener,
    observe_freshness,
)
from .pipeline import (
    EVENTS_STREAM_SCHEMA,
    dedup_events_within_watermark,
    index_maintenance_batch,
    index_tree_compact,
    stream_index_maintenance,
    interval_join_streams,
    read_events_stream,
    run_to_memory,
    sessionize_stream,
    stateful_sessionize,
    stateful_user_totals,
    stream_acid_merge,
    stream_merge_upsert,
    streaming_semantic_dedup,
    streaming_semantic_groups,
    streaming_simhash_near_dup,
    tumbling_event_counts,
    tuned_stream_confs,
)

__all__ = [
    "EVENTS_STREAM_SCHEMA",
    "dedup_events_within_watermark",
    "index_maintenance_batch",
    "index_tree_compact",
    "stream_index_maintenance",
    "freshness_report",
    "lateness_listener",
    "observe_freshness",
    "interval_join_streams",
    "read_events_stream",
    "run_to_memory",
    "sessionize_stream",
    "stateful_sessionize",
    "streaming_semantic_dedup",
    "streaming_semantic_groups",
    "streaming_simhash_near_dup",
    "stateful_user_totals",
    "stream_acid_merge",
    "stream_merge_upsert",
    "tumbling_event_counts",
    "tuned_stream_confs",
]
