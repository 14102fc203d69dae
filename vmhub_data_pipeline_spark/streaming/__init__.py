from .events import (  # noqa: F401
    EVENTS_SCHEMA,
    events_file_stream,
    stream_tumbling_counts,
    stream_sliding_counts,
    stream_session_windows,
    stream_dedup,
    start_to_memory,
)
