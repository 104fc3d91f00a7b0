"""SPARQL-style basic-graph-pattern queries over the triples DataFrame.

The reference's query surface is ``make_query(sparql)`` → rdflib BGP
evaluation (core.py:1321-1340). Here every triple pattern becomes a
filter on the triples table and shared variables become equi-joins —
Catalyst plans the join order / broadcast strategy; we write no
evaluator of our own.

Pattern syntax: a 3-tuple of strings; ``?name`` marks a variable,
anything else is matched literally (IRIs or literal lexical forms).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import DataFrame, functions as F

Pattern = Tuple[str, str, str]
_POS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return term.startswith("?")


def bgp(triples: DataFrame, patterns: Sequence[Pattern], select: List[str]) -> DataFrame:
    """Evaluate a BGP; returns one column per selected variable,
    set semantics (DISTINCT) like the reference's ``make_query``."""
    result = None
    for i, (s, p, o) in enumerate(patterns):
        t = triples
        cols = []
        for pos, term in zip(_POS, (s, p, o)):
            if _is_var(term):
                cols.append(F.col(pos).alias(term[1:]))
            else:
                t = t.filter(F.col(pos) == term)
        t = t.select(*cols) if cols else t.select(F.lit(1).alias(f"_m{i}"))
        if result is None:
            result = t
        else:
            shared = [c for c in t.columns if c in result.columns]
            result = result.join(t, shared) if shared else result.crossJoin(t)
    assert result is not None, "empty pattern list"
    return result.select(*[v.lstrip("?") for v in select]).distinct()
