from .readers import load_tables, normalize_columns, read_csv, read_parquet, TABLES
from .writers import write_parquet, append_if_absent

__all__ = [
    "TABLES",
    "load_tables",
    "normalize_columns",
    "read_csv",
    "read_parquet",
    "write_parquet",
    "append_if_absent",
]
