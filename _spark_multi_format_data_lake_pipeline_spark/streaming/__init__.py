from .events import (
    read_event_stream,
    tumbling_counts,
    sliding_counts,
    session_counts,
    dedup_events,
    stream_static_join,
    run_available_now,
)

__all__ = [
    "read_event_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "dedup_events",
    "stream_static_join",
    "run_available_now",
]
