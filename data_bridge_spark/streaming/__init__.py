from data_bridge_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    stream_dedup,
    stream_session_window,
    stream_sliding_counts,
    stream_tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "run_to_memory",
    "stream_dedup",
    "stream_session_window",
    "stream_sliding_counts",
    "stream_tumbling_counts",
]
