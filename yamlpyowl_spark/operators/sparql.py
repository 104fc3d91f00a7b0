"""SPARQL-subset queries over the triples DataFrame.

The reference's query surface is ``make_query(sparql)`` evaluated by
rdflib over its quadstore (core.py:1321-1340); its own tests use
PREFIX + one/two-pattern SELECT BGPs (tests/test_core.py:124-144).
This module parses that subset plus the three next-most-common SPARQL
constructs — ``FILTER`` (comparisons, ``&&``-conjoined), ``UNION`` and
``OPTIONAL`` — and compiles them onto DataFrame filters / equi-joins /
unions / left joins. Catalyst plans the execution; we write no
evaluator of our own.

Still-unsupported SPARQL (GRAPH, MINUS, BIND, VALUES, property paths,
subqueries) raises — loudly, not wrongly.
"""

from __future__ import annotations

import re
from typing import List, Tuple

from pyspark.sql import DataFrame, functions as F

_PREFIX_RE = re.compile(r"PREFIX\s+(\w*):\s*<([^>]+)>", re.IGNORECASE)
_SELECT_RE = re.compile(
    r"SELECT\s+(DISTINCT\s+)?(.+?)\s+WHERE\s*\{(.*)\}\s*$", re.IGNORECASE | re.DOTALL
)
_UNSUPPORTED = re.compile(r"\b(GRAPH|MINUS|BIND|VALUES|EXISTS|ASK|CONSTRUCT)\b", re.IGNORECASE)

# IRIs contain no whitespace/angle brackets, so `< 3` in a FILTER can
# never be mistaken for an IRI opener
_TOKEN_RE = re.compile(
    r"""(?P<lbrace>\{) | (?P<rbrace>\}) | (?P<lparen>\() | (?P<rparen>\)) |
        (?P<kw>OPTIONAL|UNION|FILTER)\b |
        \?(?P<var>\w+) | <(?P<iri>[^<>\s]+)> |
        "(?P<lit>(?:[^"\\]|\\.)*)" |
        (?P<num>-?\d+(?:\.\d+)?) |
        (?P<op>!=|<=|>=|=|<|>|&&) |
        (?P<pname>\w*:\w+) |
        (?P<dot>\.)
    """,
    re.VERBOSE | re.IGNORECASE,
)


class SparqlError(ValueError):
    pass


def _term_of(tok: re.Match, prefixes: dict) -> str:
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


def _tokenize(block: str) -> List[re.Match]:
    toks, pos = [], 0
    for m in _TOKEN_RE.finditer(block):
        if block[pos : m.start()].strip():
            raise SparqlError(f"cannot tokenize: {block[pos:m.start()]!r}")
        toks.append(m)
        pos = m.end()
    if block[pos:].strip():
        raise SparqlError(f"cannot tokenize: {block[pos:]!r}")
    return toks


def _kind(tok: re.Match) -> str:
    return tok.lastgroup or ""


class _Parser:
    """Recursive-descent over the WHERE block token stream.

    Group items: ("t", (s,p,o)) | ("filter", [(var, op, const), ...])
    | ("union", groupA, groupB) | ("optional", group)."""

    def __init__(self, toks: List[re.Match], prefixes: dict):
        self.toks = toks
        self.prefixes = prefixes
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        tok = self.peek()
        if tok is None:
            raise SparqlError("unexpected end of query")
        self.i += 1
        return tok

    def expect(self, kind: str):
        tok = self.next()
        if _kind(tok) != kind:
            raise SparqlError(f"expected {kind}, got {tok.group(0)!r}")
        return tok

    def group(self) -> list:
        """Parse items until the matching '}' (or end at top level)."""
        items = []
        while True:
            tok = self.peek()
            if tok is None or _kind(tok) == "rbrace":
                return items
            k = _kind(tok)
            if k == "dot":
                self.next()
                continue
            if k == "kw":
                kw = tok.group("kw").upper()
                self.next()
                if kw == "FILTER":
                    items.append(("filter", self._filter()))
                elif kw == "OPTIONAL":
                    self.expect("lbrace")
                    g = self.group()
                    self.expect("rbrace")
                    items.append(("optional", g))
                else:
                    raise SparqlError("UNION must follow a braced group")
                continue
            if k == "lbrace":
                self.next()
                g1 = self.group()
                self.expect("rbrace")
                nxt = self.peek()
                if nxt is not None and _kind(nxt) == "kw" and nxt.group("kw").upper() == "UNION":
                    self.next()
                    self.expect("lbrace")
                    g2 = self.group()
                    self.expect("rbrace")
                    items.append(("union", g1, g2))
                else:
                    items.extend(g1)  # plain nested group = same scope
                continue
            # otherwise: a triple pattern (3 terms)
            terms = [_term_of(self.next(), self.prefixes) for _ in range(3)]
            items.append(("t", tuple(terms)))

    def _filter(self) -> list:
        """FILTER ( ?v op const [&& ?w op const ...] )"""
        self.expect("lparen")
        comps = []
        while True:
            var_tok = self.next()
            if _kind(var_tok) != "var":
                raise SparqlError("FILTER supports ?var <op> constant comparisons")
            op = self.expect("op").group("op")
            if op == "&&":
                raise SparqlError("expected comparison operator after FILTER variable")
            const_tok = self.next()
            if _kind(const_tok) not in ("lit", "num", "iri", "pname"):
                raise SparqlError("FILTER right-hand side must be a constant")
            comps.append(("?" + var_tok.group("var"), op, _term_of(const_tok, self.prefixes),
                          _kind(const_tok) == "num"))
            nxt = self.next()
            if _kind(nxt) == "rparen":
                return comps
            if _kind(nxt) != "op" or nxt.group("op") != "&&":
                raise SparqlError(f"expected && or ) in FILTER, got {nxt.group(0)!r}")


def _parse(src: str):
    if _UNSUPPORTED.search(src):
        raise SparqlError(
            f"unsupported SPARQL construct: {_UNSUPPORTED.search(src).group(0)}"
        )
    prefixes = dict((m.group(1), m.group(2)) for m in _PREFIX_RE.finditer(src))
    m = _SELECT_RE.search(src.strip())
    if not m:
        raise SparqlError("expected `SELECT ... WHERE { ... }`")
    select_vars = re.findall(r"\?(\w+)", m.group(2))
    if not select_vars:
        raise SparqlError("SELECT needs at least one ?variable")
    parser = _Parser(_tokenize(m.group(3)), prefixes)
    items = parser.group()
    if parser.peek() is not None:
        raise SparqlError(f"trailing tokens: {parser.peek().group(0)!r}")
    if not any(k[0] in ("t", "union") for k in items):
        raise SparqlError(
            "WHERE block has no required triple patterns "
            "(OPTIONAL/FILTER alone is not a query)"
        )
    return ["?" + v for v in select_vars], items


def parse_sparql(src: str) -> Tuple[List[str], List[Tuple[str, str, str]]]:
    """Legacy surface: (selected variables, plain triple patterns).
    Raises on FILTER/UNION/OPTIONAL — use :func:`make_query` for those."""
    select_vars, items = _parse(src)
    if any(k[0] != "t" for k in items):
        raise SparqlError("query uses FILTER/UNION/OPTIONAL — evaluate via make_query")
    return select_vars, [it[1] for it in items]


# ---------------------------------------------------------------------------
# compilation
# ---------------------------------------------------------------------------

_POS = ("subj", "pred", "obj")


def _pattern_frame(triples: DataFrame, pat, idx: int) -> DataFrame:
    t = triples
    cols = []
    for pos, term in zip(_POS, pat):
        if term.startswith("?"):
            cols.append(F.col(pos).alias(term[1:]))
        else:
            t = t.filter(F.col(pos) == term)
    return t.select(*cols) if cols else t.select(F.lit(1).alias(f"_m{idx}"))


def _merge(a: DataFrame, b: DataFrame, how: str = "inner") -> DataFrame:
    shared = [c for c in b.columns if c in a.columns]
    if shared:
        return a.join(b, shared, how)
    return a.crossJoin(b) if how == "inner" else a.join(b, F.lit(True), "left")


def _compile(triples: DataFrame, items: list) -> DataFrame:
    df = None
    filters = []
    for n, item in enumerate(items):
        kind = item[0]
        if kind == "t":
            frame = _pattern_frame(triples, item[1], n)
            df = frame if df is None else _merge(df, frame)
        elif kind == "union":
            a = _compile(triples, item[1])
            b = _compile(triples, item[2])
            if set(a.columns) != set(b.columns):
                raise SparqlError(
                    f"UNION branches must bind the same variables: "
                    f"{sorted(a.columns)} vs {sorted(b.columns)}"
                )
            u = a.unionByName(b)
            df = u if df is None else _merge(df, u)
        elif kind == "optional":
            o = _compile(triples, item[1])
            if df is None:
                raise SparqlError("OPTIONAL cannot be the first group member")
            df = _merge(df, o, "left")
        elif kind == "filter":
            filters.extend(item[1])
    if df is None:
        raise SparqlError("empty graph pattern")
    for var, op, const, is_num in filters:
        name = var[1:]
        if name not in df.columns:
            raise SparqlError(f"FILTER on unbound variable {var}")
        col = F.col(name).cast("double") if is_num else F.col(name)
        rhs = F.lit(float(const)) if is_num else F.lit(const)
        cond = {
            "=": col == rhs,
            "!=": col != rhs,
            "<": col < rhs,
            ">": col > rhs,
            "<=": col <= rhs,
            ">=": col >= rhs,
        }[op]
        df = df.filter(cond)
    return df


def make_query(triples: DataFrame, sparql_src: str) -> DataFrame:
    """Evaluate a SPARQL-subset SELECT over the triples table; DISTINCT
    semantics like the reference's set() (core.py:1340). Supports BGPs
    plus FILTER comparisons, UNION and OPTIONAL (left join)."""
    select_vars, items = _parse(sparql_src)
    df = _compile(triples, items)
    missing = [v for v in select_vars if v[1:] not in df.columns]
    if missing:
        raise SparqlError(f"SELECT variables never bound: {missing}")
    return df.select(*[v[1:] for v in select_vars]).distinct()
