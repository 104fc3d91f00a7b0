from .dedup_incremental import drain_incremental_candidates, incremental_candidates
from .incremental import incremental_kg_query, run_incremental
from .windowed import sessionize_stream, windowed_event_counts

__all__ = [
    "drain_incremental_candidates",
    "incremental_candidates",
    "incremental_kg_query",
    "run_incremental",
    "sessionize_stream",
    "windowed_event_counts",
]
