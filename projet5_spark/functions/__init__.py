from .strings import normalize_name, title_case
from .dates import parse_date
from .keys import surrogate_key
from .vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "normalize_name",
    "title_case",
    "parse_date",
    "surrogate_key",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
