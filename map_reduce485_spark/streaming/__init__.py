"""Structured Streaming surface (north-star; reference is batch-only)."""

from map_reduce485_spark.streaming.jobs import (
    EVENTS_SCHEMA,
    read_events_stream,
    stream_dedup_exact,
    stream_sessionize,
    stream_sliding_counts,
    stream_tumbling_counts,
    stream_user_running_totals,
    stream_view_purchase_join,
    run_foreach_batch_upsert,
)

__all__ = [
    "EVENTS_SCHEMA",
    "read_events_stream",
    "stream_tumbling_counts",
    "stream_sessionize",
    "stream_sliding_counts",
    "stream_dedup_exact",
    "stream_user_running_totals",
    "stream_view_purchase_join",
    "run_foreach_batch_upsert",
]
