"""Sources & sinks: pipe-delimited text (reference-compatible), Parquet
(engine-native), catalog registration, and text/Parquet sinks."""

from .catalog import load_table, load_tables, register_views
from .csv import read_pipe_table, read_store, read_store_sales
from .sinks import write_parquet, write_tab_text

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "read_pipe_table",
    "read_store",
    "read_store_sales",
    "write_parquet",
    "write_tab_text",
]
