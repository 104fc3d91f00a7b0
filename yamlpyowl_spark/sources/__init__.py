from ..parser.imports import (
    build_import_map,
    build_import_map_from_corpus,
    build_import_map_from_iris,
)
from .fixtures import (
    DEMO_ONTOLOGY,
    FIXTURE_SPECS,
    build_default_import_map,
    load_fixture_texts,
    reference_available,
)

__all__ = [
    "DEMO_ONTOLOGY",
    "build_import_map",
    "build_import_map_from_corpus",
    "build_import_map_from_iris",
    "FIXTURE_SPECS",
    "build_default_import_map",
    "load_fixture_texts",
    "reference_available",
]
