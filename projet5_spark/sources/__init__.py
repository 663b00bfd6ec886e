from .readers import (
    TABLES,
    load_tables,
    normalize_columns,
    read_csv,
    read_events,
    read_parquet,
)
from .writers import append_if_absent, merge_upsert, scd2_upsert, write_mongodb, write_parquet

__all__ = [
    "TABLES",
    "load_tables",
    "normalize_columns",
    "read_csv",
    "read_events",
    "read_parquet",
    "write_parquet",
    "append_if_absent",
    "merge_upsert",
    "scd2_upsert",
    "write_mongodb",
]
