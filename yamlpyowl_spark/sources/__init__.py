from .fixtures import (
    DEMO_ONTOLOGY,
    FIXTURE_SPECS,
    build_default_import_map,
    load_fixture_texts,
    reference_available,
)

__all__ = [
    "DEMO_ONTOLOGY",
    "FIXTURE_SPECS",
    "build_default_import_map",
    "load_fixture_texts",
    "reference_available",
]
