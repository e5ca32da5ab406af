from .incremental import (
    compact_ledger,
    dedup_stream,
    enrich_stream,
    incremental_merge_stream,
    ingest_dedup_stream,
    ingest_media_dedup_stream,
    ingest_neardup_stream,
    ingest_span_dedup_stream,
    windowed_event_counts,
)
from .sessionize import sessionize_stream

__all__ = [
    "compact_ledger",
    "dedup_stream",
    "enrich_stream",
    "incremental_merge_stream",
    "ingest_dedup_stream",
    "ingest_media_dedup_stream",
    "ingest_neardup_stream",
    "ingest_span_dedup_stream",
    "sessionize_stream",
    "windowed_event_counts",
]
