from .lake import (
    compact,
    manifest_from_links,
    pending_entries,
    read_pruned,
    write_partitioned,
)
from .warc import parse_warc_records, read_warc, warc_records
from .readers import (
    from_pandas,
    load_table,
    load_tables,
    read_binary_files,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_text,
    register_views,
    to_pandas,
)

__all__ = [
    "compact",
    "from_pandas",
    "load_table",
    "load_tables",
    "manifest_from_links",
    "parse_warc_records",
    "read_warc",
    "warc_records",
    "pending_entries",
    "read_binary_files",
    "read_csv",
    "read_orc",
    "read_json",
    "read_parquet",
    "read_text",
    "read_pruned",
    "register_views",
    "to_pandas",
    "write_partitioned",
]
