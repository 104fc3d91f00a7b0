from .incremental import incremental_kg_query, run_incremental
from .windowed import sessionize_stream, windowed_event_counts

__all__ = [
    "incremental_kg_query",
    "run_incremental",
    "sessionize_stream",
    "windowed_event_counts",
]
