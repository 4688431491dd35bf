from parquet_rewriter_spark.streaming.ops import (
    dedup_within_watermark,
    run_to_memory,
    session_window_stats,
    sessionize_with_state,
    sliding_counts,
    stream_events,
    stream_maintain_aggregate,
    stream_merge_into_table,
    stream_stream_interval_join,
    tumbling_counts,
)

__all__ = [
    "stream_events",
    "tumbling_counts",
    "sliding_counts",
    "session_window_stats",
    "sessionize_with_state",
    "dedup_within_watermark",
    "run_to_memory",
    "stream_maintain_aggregate",
    "stream_merge_into_table",
    "stream_stream_interval_join",
]
