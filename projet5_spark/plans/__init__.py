"""End-to-end plans.

- ``healthcare``: the reference-parity pipeline (SURVEY.md §2.4) —
  scan → normalize → profile → dedup → dim extraction → surrogate keys →
  broadcast join-back → first-seen fact dedup → idempotent sink.
- ``registry`` + ``relational``/``llm``/``events``: the driver-facing
  query catalog; every entry pairs a DataFrame builder with a DuckDB
  oracle SQL string (SURVEY.md §5.2).
"""

from .registry import QUERIES, ORACLE, query

from . import healthcare  # noqa: E402,F401  (flagship parity pipeline first)
from . import relational  # noqa: E402,F401  (registers queries on import)
from . import llm  # noqa: E402,F401
from . import statistics  # noqa: E402,F401
from . import tpch_extra  # noqa: E402,F401
from . import series  # noqa: E402,F401
from . import text_ml  # noqa: E402,F401
from . import sql_surface  # noqa: E402,F401
from . import analytics2  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import splits  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import audit  # noqa: E402,F401
from . import analytics3  # noqa: E402,F401
from . import layout  # noqa: E402,F401
from . import analytics4  # noqa: E402,F401
from . import spark4  # noqa: E402,F401
from . import analytics5  # noqa: E402,F401
from . import analytics6  # noqa: E402,F401
from . import analytics7  # noqa: E402,F401
from . import analytics8  # noqa: E402,F401
from . import analytics9  # noqa: E402,F401
from . import analytics10  # noqa: E402,F401
from . import analytics11  # noqa: E402,F401
from . import analytics12  # noqa: E402,F401
from . import analytics13  # noqa: E402,F401
from . import analytics14  # noqa: E402,F401
from . import analytics15  # noqa: E402,F401
from . import analytics16  # noqa: E402,F401
from . import analytics17  # noqa: E402,F401
from . import analytics18  # noqa: E402,F401
from . import analytics19  # noqa: E402,F401
from . import analytics20  # noqa: E402,F401
from . import analytics21  # noqa: E402,F401
from . import analytics22  # noqa: E402,F401
from . import analytics23  # noqa: E402,F401
from . import analytics24  # noqa: E402,F401
from . import analytics25  # noqa: E402,F401
from . import scans  # noqa: E402,F401
from . import analytics26  # noqa: E402,F401
from . import analytics27  # noqa: E402,F401
from . import analytics28  # noqa: E402,F401
from . import analytics29  # noqa: E402,F401
from . import analytics30  # noqa: E402,F401
from . import analytics31  # noqa: E402,F401
from . import analytics32  # noqa: E402,F401
from . import analytics33  # noqa: E402,F401
from . import streaming_certified  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLE", "query"]
