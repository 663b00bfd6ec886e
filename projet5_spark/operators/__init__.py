from .profile import null_profile, duplicate_count, table_stats
from .dedup import first_seen_dedup, keyed_dedup, exact_text_dedup
from .joins import broadcast_join, asof_join

__all__ = [
    "null_profile",
    "duplicate_count",
    "table_stats",
    "first_seen_dedup",
    "keyed_dedup",
    "exact_text_dedup",
    "broadcast_join",
    "asof_join",
]
