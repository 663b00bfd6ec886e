from .windows import (
    stream_events,
    streaming_tumbling_stats,
    streaming_session_windows,
    streaming_dedup,
    streaming_dedup_within_watermark,
    run_to_completion,
)
from .joins import purchase_view_join
from .sinks import stream_to_parquet_idempotent
from .stateful import batch_user_profiles, streaming_user_profiles

__all__ = [
    "stream_events",
    "streaming_tumbling_stats",
    "streaming_session_windows",
    "streaming_dedup",
    "streaming_dedup_within_watermark",
    "run_to_completion",
    "purchase_view_join",
    "stream_to_parquet_idempotent",
    "streaming_user_profiles",
    "batch_user_profiles",
]
