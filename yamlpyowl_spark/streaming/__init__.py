from .incremental import incremental_kg_query, run_incremental

__all__ = ["incremental_kg_query", "run_incremental"]
