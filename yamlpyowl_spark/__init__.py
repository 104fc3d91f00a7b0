"""yamlpyowl_spark — a from-scratch, PySpark-native knowledge-graph
construction pipeline with the query & data-processing capabilities of
cknoll/yamlpyowl (reference, read-only, at /root/reference).

Layers:

* ``parser``    — pure-Python per-document YAML→OWL-triples semantics
                  (runs inside Arrow-batched pandas UDFs on executors)
* ``sources``   — corpus synthesis + scan/filter of the input table
                  ``(repo, path, commit, lang, content)``
* ``functions`` — UDFs and JVM-side column functions (text analysis,
                  hashing, embeddings)
* ``operators`` — DataFrame-level graph & data operators (BGP queries,
                  transitive closure, connected components, entity
                  linking, dedup, similarity search, SWRL forward
                  chaining)
* ``plans``     — end-to-end pipeline, checkpoint/resume, session config
* ``streaming`` — incremental KG construction via Structured Streaming
"""

__version__ = "0.1.0"

# module-level helpers users of the reference import directly
# (reference core.py: check_type :1365, test_type :1397, ensure_list
# :1346, unpack_len1_mapping :1406, render_using_label :32)
from .parser.model import ensure_list, unpack_len1_mapping  # noqa: E402
from .typecheck import check_type, test_type  # noqa: E402


def render_using_label(entity) -> str:
    """repr an entity by its first label, falling back to its name
    (reference core.py:32-38)."""
    try:
        label = entity.label
        first = label.first() if hasattr(label, "first") else (label[0] if label else None)
        repr_str = first or entity.name
    except Exception:
        repr_str = getattr(entity, "name", None) or "<no label>"
    return f"<{type(entity)} '{repr_str}'>"


# root-level session surface, lazily resolved so importing the package
# (e.g. for the pure-Python parser) doesn't pull pyspark: a reference
# user writes `import yamlpyowl as ypo; ypo.OntologyManager(...)` —
# the same spelling works here
_API_NAMES = ("OntologyManager", "Or", "And", "Not", "OneOf", "Restriction")


def __getattr__(name):
    if name in _API_NAMES:
        from . import api

        return getattr(api, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "check_type",
    "test_type",
    "ensure_list",
    "unpack_len1_mapping",
    "render_using_label",
    "OntologyManager",
    "Or",
    "And",
    "Not",
    "OneOf",
    "Restriction",
    "__version__",
]
