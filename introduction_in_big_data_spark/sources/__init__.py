from .tables import TABLE_NAMES, load_table, load_tables, register_views
from .readers import read_csv, read_jdbc, read_ndjson, read_parquet
from .read_table import detect_format, read_table
from .writers import write_csv, write_parquet, write_jdbc

__all__ = [
    "TABLE_NAMES",
    "detect_format",
    "read_table",
    "load_table",
    "load_tables",
    "register_views",
    "read_csv",
    "read_jdbc",
    "read_ndjson",
    "read_parquet",
    "write_csv",
    "write_parquet",
    "write_jdbc",
]
