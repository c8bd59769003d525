from .events import (
    read_events_stream,
    sessionized_stream,
    stream_dedup,
    windowed_counts_stream,
)

__all__ = [
    "read_events_stream",
    "sessionized_stream",
    "stream_dedup",
    "windowed_counts_stream",
]
