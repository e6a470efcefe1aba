from .ingest import stream_insert_into_store, stream_json_to_quads
from .windows import dedup_events, sessionize, windowed_event_counts

__all__ = [
    "stream_json_to_quads",
    "stream_insert_into_store",
    "windowed_event_counts",
    "dedup_events",
    "sessionize",
]
