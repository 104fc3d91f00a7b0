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

from .typecheck import check_type  # noqa: E402  (reference: ypo.check_type)

__all__ = ["check_type", "__version__"]
