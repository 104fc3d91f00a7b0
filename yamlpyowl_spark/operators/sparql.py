"""SPARQL-subset queries over the triples DataFrame.

The reference's query surface is ``make_query(sparql)`` evaluated by
rdflib over its quadstore (core.py:1321-1340); its own tests use
PREFIX + one/two-pattern SELECT BGPs (tests/test_core.py:124-144).
This module parses exactly that subset — PREFIX declarations, SELECT
with one or more variables, a WHERE block of triple patterns with
prefixed names, absolute IRIs in ``<>``, quoted literals and numbers —
and compiles it onto :func:`yamlpyowl_spark.operators.bgp.bgp`
(filters + equi-joins; Catalyst plans the execution; we write no
evaluator).

Unsupported SPARQL (OPTIONAL, FILTER, UNION, paths) raises — loudly,
not wrongly.
"""

from __future__ import annotations

import re
from typing import List, Tuple

from pyspark.sql import DataFrame

from .bgp import bgp

_PREFIX_RE = re.compile(r"PREFIX\s+(\w*):\s*<([^>]+)>", re.IGNORECASE)
_SELECT_RE = re.compile(r"SELECT\s+(.+?)\s+WHERE\s*\{(.*)\}", re.IGNORECASE | re.DOTALL)
_UNSUPPORTED = re.compile(r"\b(OPTIONAL|FILTER|UNION|GRAPH|MINUS|BIND|VALUES)\b", re.IGNORECASE)

_TERM_RE = re.compile(
    r"""\?(?P<var>\w+)
      | <(?P<iri>[^>]+)>
      | "(?P<lit>(?:[^"\\]|\\.)*)"
      | (?P<num>-?\d+(?:\.\d+)?)
      | (?P<pname>\w*:\w+)
    """,
    re.VERBOSE,
)


class SparqlError(ValueError):
    pass


def _parse_term(tok: re.Match, prefixes: dict) -> str:
    if tok.group("var") is not None:
        return "?" + tok.group("var")
    if tok.group("iri") is not None:
        return tok.group("iri")
    if tok.group("lit") is not None:
        return tok.group("lit").replace('\\"', '"')
    if tok.group("num") is not None:
        return tok.group("num")
    pname = tok.group("pname")
    pfx, local = pname.split(":", 1)
    if pfx not in prefixes:
        raise SparqlError(f"undeclared prefix: {pfx}")
    return prefixes[pfx] + local


def parse_sparql(src: str) -> Tuple[List[str], List[Tuple[str, str, str]]]:
    """→ (selected variables, triple patterns with absolute IRIs)."""
    if _UNSUPPORTED.search(src):
        raise SparqlError(
            f"only SELECT basic-graph-pattern queries are supported: "
            f"{_UNSUPPORTED.search(src).group(0)} is not"
        )
    prefixes = dict((m.group(1), m.group(2)) for m in _PREFIX_RE.finditer(src))
    m = _SELECT_RE.search(src)
    if not m:
        raise SparqlError("expected `SELECT ... WHERE { ... }`")
    select_vars = re.findall(r"\?(\w+)", m.group(1))
    if not select_vars:
        raise SparqlError("SELECT needs at least one ?variable")

    # tokenize the whole block (splitting on '.' would break literals
    # containing dots, e.g. "§ 1.1"); patterns are always term triples
    toks = list(_TERM_RE.finditer(m.group(2)))
    if not toks or len(toks) % 3 != 0:
        raise SparqlError(f"WHERE block is not a sequence of triple patterns: {m.group(2)!r}")
    terms = [_parse_term(t, prefixes) for t in toks]
    patterns = [tuple(terms[i : i + 3]) for i in range(0, len(terms), 3)]
    return ["?" + v for v in select_vars], patterns


def make_query(triples: DataFrame, sparql_src: str) -> DataFrame:
    """Evaluate a SPARQL-subset SELECT over the triples table; DISTINCT
    semantics like the reference's set() (core.py:1340)."""
    select_vars, patterns = parse_sparql(sparql_src)
    return bgp(triples, patterns, select_vars)
