from .bgp import bgp
from .cc import connected_components
from .closure import transitive_closure
from .linking import alias_edges, canonical_edges, canonical_mapping, canonical_nodes

__all__ = [
    "bgp",
    "connected_components",
    "transitive_closure",
    "alias_edges",
    "canonical_edges",
    "canonical_mapping",
    "canonical_nodes",
]
