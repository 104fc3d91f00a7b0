from .document import DocumentParser, ParseResult, ParseError, UnknownEntityError, parse_document, sha256_hex
from .imports import build_import_map, parse_owl_rdfxml
from .model import Construct, Ent, InverseProp, Restriction

__all__ = [
    "DocumentParser",
    "ParseResult",
    "ParseError",
    "UnknownEntityError",
    "parse_document",
    "sha256_hex",
    "build_import_map",
    "parse_owl_rdfxml",
    "Construct",
    "Ent",
    "InverseProp",
    "Restriction",
]
