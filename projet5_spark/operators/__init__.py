from .profile import null_profile, duplicate_count, table_stats
from .dedup import (
    exact_text_dedup,
    first_seen_dedup,
    first_seen_dedup_agg,
    keyed_dedup,
)
from .joins import asof_join, broadcast_join, salted_join
from .graph import connected_components

__all__ = [
    "null_profile",
    "duplicate_count",
    "table_stats",
    "first_seen_dedup",
    "first_seen_dedup_agg",
    "keyed_dedup",
    "exact_text_dedup",
    "broadcast_join",
    "asof_join",
    "salted_join",
    "connected_components",
]
