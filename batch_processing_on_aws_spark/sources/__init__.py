from .readers import load_table, load_tables, read_csv, read_json, read_parquet, register_views

__all__ = [
    "load_table",
    "load_tables",
    "read_csv",
    "read_json",
    "read_parquet",
    "register_views",
]
