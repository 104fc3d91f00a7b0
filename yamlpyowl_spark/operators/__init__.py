from .bgp import bgp
from .cc import connected_components, connected_components_star
from .closure import transitive_closure
from .linking import alias_edges, canonical_edges, canonical_mapping, canonical_nodes

__all__ = [
    "bgp",
    "connected_components",
    "connected_components_star",
    "transitive_closure",
    "alias_edges",
    "canonical_edges",
    "canonical_mapping",
    "canonical_nodes",
]
