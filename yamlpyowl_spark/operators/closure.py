"""Semi-naive transitive closure of an edge relation.

Used for rdfs:subClassOf / transitive-property closure (the reference
delegates this to the Pellet reasoner; here it is an iterative
DataFrame self-join). Semi-naive: each round joins only the *delta*
paths against the base edges, so work is proportional to new paths, not
all paths. ``localCheckpoint`` per round cuts the growing lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """All pairs (src, dst) reachable via 1+ hops. Deduplicated."""
    base = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct().persist()
    closure = base.localCheckpoint()
    delta = closure

    for _ in range(max_iter):
        new_paths = (
            delta.alias("d")
            .join(base.alias("b"), F.col("d.dst") == F.col("b.src"))
            .select(F.col("d.src").alias("src"), F.col("b.dst").alias("dst"))
            .distinct()
        )
        delta = new_paths.join(closure, ["src", "dst"], "left_anti").localCheckpoint()
        if delta.isEmpty():
            break
        closure = closure.union(delta).localCheckpoint()

    base.unpersist()
    return closure
