from .pipeline import KGPipeline, ontology_document_filter
from .session import get_spark

__all__ = ["KGPipeline", "ontology_document_filter", "get_spark"]
