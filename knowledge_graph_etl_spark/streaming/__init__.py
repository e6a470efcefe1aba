from .ingest import stream_insert_into_store, stream_json_to_quads
from .curate import curate_docs
from .drift import cusum_alarms
from .joins import enrich_stream, interval_join
from .neardup import flag_neardups
from .windows import dedup_events, sessionize, windowed_event_counts

__all__ = [
    "cusum_alarms",
    "flag_neardups",
    "curate_docs",
    "enrich_stream",
    "interval_join",
    "stream_json_to_quads",
    "stream_insert_into_store",
    "windowed_event_counts",
    "dedup_events",
    "sessionize",
]
