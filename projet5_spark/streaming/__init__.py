from .windows import (
    stream_events,
    streaming_tumbling_stats,
    streaming_session_windows,
    streaming_dedup,
    run_to_completion,
)
from .joins import purchase_view_join

__all__ = [
    "stream_events",
    "streaming_tumbling_stats",
    "streaming_session_windows",
    "streaming_dedup",
    "run_to_completion",
    "purchase_view_join",
]
