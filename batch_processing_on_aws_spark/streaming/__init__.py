from .incremental import incremental_merge_stream, windowed_event_counts

__all__ = ["incremental_merge_stream", "windowed_event_counts"]
