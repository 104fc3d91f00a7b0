"""SPARQL-subset queries over the triples DataFrame.

The reference's query surface is ``make_query(sparql)`` evaluated by
rdflib over its quadstore (core.py:1321-1340); its own tests use
PREFIX + one/two-pattern SELECT BGPs (tests/test_core.py:124-144).
This module parses that subset plus the next-most-common SPARQL
constructs — ``FILTER`` (boolean expressions over ``||``/``&&``/``!``,
comparisons with arithmetic operands, ``IN``/``NOT IN``, ``bound()``,
``regex()``, ``STRSTARTS()``/``STRENDS()``/``CONTAINS()``,
``sameTerm()``,
``isIRI()``/``isURI()``/``isLiteral()``/``isBlank()``, the
``STR()``/``LANG()``/``DATATYPE()``/``STRLEN()``/``UCASE()``/
``LCASE()`` accessors, and the r6 value-expression layer:
``SUBSTR()``/``REPLACE()``/``CONCAT()``/``STRBEFORE()``/
``STRAFTER()``, numeric
``ABS()``/``CEIL()``/``FLOOR()``/``ROUND()``, hash digests
``MD5()``/``SHA1()``/``SHA256()``, xsd:dateTime accessors
``YEAR()``/``MONTH()``/``DAY()``/``HOURS()``/``MINUTES()``/
``SECONDS()``/``TZ()``/``NOW()``, ``ENCODE_FOR_URI()``,
``IRI()``/``URI()`` (lexical pass-through), ``isNumeric()``,
``langMatches()``, ``COALESCE()`` and
``IF()``), ``UNION``, ``OPTIONAL``, ``MINUS``,
``VALUES`` (single-var and tuple forms, ``UNDEF`` rows grouped by
defined-mask), expression ``BIND``, property
paths (the complete SPARQL 1.1 §9.1 grammar, r6c: ``p+``
one-or-more, ``p*`` zero-or-more, ``p?`` zero-or-one, ``^path``
inverse, ``|`` alternation, ``/`` sequence — ``/`` binding tighter
than ``|`` per §18.2.2 — negated property sets ``!p`` /
``!(p1|^p2|…)``, and parenthesized groups nesting under any
modifier: ``(p1/p2)+``, ``^(p|q)``, ``((a/b)|c)+``), aggregates (``(COUNT|SUM|MIN|MAX|AVG|SAMPLE)(?v)``,
``COUNT(*)``, ``COUNT(DISTINCT ?v)``, ``GROUP_CONCAT(?v; SEPARATOR
"...")``) with ``GROUP BY``, value expressions in the projection
(``(expr AS ?alias)`` — post-aggregation when aggregates are
present), the ``ORDER BY`` /
``LIMIT`` / ``OFFSET`` / ``HAVING`` solution modifiers (``SELECT
DISTINCT`` and ``SELECT REDUCED`` both parse — results are
set-semantic either way, a permitted REDUCED answer; ``HAVING``
takes ``&&`` / ``||`` / ``!`` combinations of aggregate / alias
comparisons against numeric constants, r6d), and the
``ASK`` / ``CONSTRUCT`` / ``DESCRIBE`` query forms, ``FILTER (NOT) EXISTS``
(left-semi / left-anti join on the shared variables), and ``GRAPH``
(the triples table is a quad store keyed by ``doc_iri``: a constant
graph IRI is a pushdown-friendly filter; ``GRAPH ?g`` binds
``doc_iri`` — BGPs and property paths inside the variable form, r6:
paths run over graph-composed node keys so closures stay
graph-local), ``FROM`` / ``FROM NAMED`` dataset clauses (r6c —
§13.2: the default graph is the merge of the FROM graphs, GRAPH
ranges over the FROM NAMED set, a missing twin leaves that side
empty; compiled to pushdown ``isin`` filters), and subqueries
(``{ SELECT ... }`` compiled independently, joined to the outer
pattern on the shared variables) — and compiles
them onto DataFrame
filters / equi-joins / unions / left and anti joins / local relations
/ ``groupBy().agg()`` / ``orderBy().limit()`` (Catalyst plans a
TakeOrdered, no full sort at scale) / the semi-naive
transitive-closure operator. Catalyst plans the execution; we write no
evaluator of our own.

Dialect notes (documented, not silent): var-var ordering comparisons
(``FILTER(?a < ?b)``) compare NUMERICALLY (both sides cast to double;
non-numeric values drop out), ``=``/``!=`` compare lexical forms;
``regex()`` uses Java regex via ``rlike``. ``BIND`` accepts the full
operand grammar (arithmetic, string/numeric functions, COALESCE/IF);
a bare numeric constant binds its lexical form. ``SUM``/``AVG`` cast to
double (non-numeric values become NULL and are skipped, as in SQL);
``MIN``/``MAX``/``ORDER BY`` compare lexical forms unless the column
is already numeric (an aggregate alias). Zero-length paths match the
identity over all terms of the graph plus any constant endpoint of
the path, per SPARQL 1.1 §9.3. ``STR()`` is the identity (terms ARE
their lexical form / IRI string here); ``LANG()`` is ``""`` (the YAML
dialect has no language-tagged literals); ``DATATYPE()`` is
``xsd:string`` for plain literals and NULL (a type error — the row
drops out of any comparison) for IRIs and blank nodes; ``IN``
compares lexical forms. ``DATATYPE()``/``isIRI()``/``isLiteral()``
need their variable bound in object position of a triple pattern in
the same group (term metadata rides on hidden companion columns bound
at that site; they never become join keys). ``sameTerm()`` compares
lexical forms (no numeric coercion) AND, when both operands carry a
literal-ness flag (a constant, or a variable with an object-position
companion), requires literal-vs-IRI agreement, per spec.
``GROUP_CONCAT`` concatenates in sorted lexical order and ``SAMPLE``
picks the minimum (deterministic dialect — the spec leaves both
unspecified); ``CEIL``/``FLOOR``/``ROUND`` stay double-typed, with
``ROUND`` rounding ties away from zero. ``isNumeric()`` is true for a
literal whose lexical form casts to a number (the engine stores terms
as lexical strings, so castability IS the numeric-typed test);
``langMatches()`` does BCP47 basic filtering over its operand (with
``LANG()`` always ``""`` here, it only matches an explicitly-bound
tag); ``YEAR()``-family accessors parse the lexical form as a
timestamp and yield NULL (type error, the row drops from filters) for
non-dateTime terms, with ``SECONDS()`` double-typed per xsd:decimal;
``MD5``/``SHA1``/``SHA256`` digest the UTF-8 bytes of the lexical
form to lowercase hex. ``TIMEZONE()`` yields the xsd:dayTimeDuration
lexical form of the offset (NULL — type error — when absent);
``STRLANG``/``STRDT`` yield the lexical form of their first argument
(no language/datatype channel attaches to BIND results — the
companion-column boundary stays loud); ``RAND``/``UUID``/``STRUUID``
and zero-arg ``BNODE`` are per-solution non-deterministic per spec
(``BNODE(str)`` raises — it needs per-label node identity the engine
does not track).

Patterns accept the Turtle-style abbreviations (r6d): ``;``
predicate-object lists, ``,`` object lists, the ``a`` → rdf:type
shorthand, ``[ ... ]`` blank-node property lists (fresh anonymous
variables, never projected) and ``_:label`` blank-node labels
(query-scoped variables per §4.1.4).

Subqueries under ``GRAPH ?var`` evaluate per active graph (patterns
bind the graph column, aggregates group by it implicitly); per-graph
LIMIT/OFFSET slices WITHIN each graph via a row_number window over
the graph column (r6d) and requires ORDER BY for determinism;
SERVICE anywhere raises — loudly, not wrongly.
"""

from __future__ import annotations

import re
from typing import List, Tuple

from pyspark.sql import DataFrame, functions as F

from ..schema import arrow_local_df

_PREFIX_RE = re.compile(r"PREFIX\s+(\w*):\s*<([^>]+)>", re.IGNORECASE)
# greedy body capture pairs with the LAST '}': everything after it is the
# solution-modifier tail (GROUP BY / ORDER BY / LIMIT)
# DISTINCT and REDUCED both parse: results are set-semantic in this
# dialect, which is exactly DISTINCT and a permitted REDUCED answer
# (SPARQL 1.1 §15.3.2 allows any amount of duplicate elimination)
_SELECT_RE = re.compile(
    r"SELECT\s+((?:DISTINCT|REDUCED)\s+)?(.+?)\s+WHERE\s*\{(.*)\}\s*(.*?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_UNSUPPORTED = re.compile(r"\bSERVICE\b", re.IGNORECASE)
# dataset clauses sit between the query form and WHERE — only text
# before the first `{` is scanned, so FROM inside a string literal in
# the body can never be misread as a dataset clause
_DATASET_RE = re.compile(
    r"\bFROM\s+(NAMED\s+)?(?:<([^>]+)>|(\w*):(\w+))", re.IGNORECASE
)
_ASK_RE = re.compile(r"^ASK\s*\{(.*)\}\s*$", re.IGNORECASE | re.DOTALL)
_DESCRIBE_RE = re.compile(
    r"^DESCRIBE\s+(.+?)(?:\s+WHERE\s*\{(.*)\})?\s*$", re.IGNORECASE | re.DOTALL
)
_CONSTRUCT_RE = re.compile(
    r"^CONSTRUCT\s*\{(.*?)\}\s*WHERE\s*\{(.*)\}\s*$", re.IGNORECASE | re.DOTALL
)
# §10.2.3 shorthand: CONSTRUCT WHERE { BGP } — the pattern doubles as
# the template (cannot collide with the long form above, which needs a
# `{` right after CONSTRUCT)
_CONSTRUCT_WHERE_RE = re.compile(
    r"^CONSTRUCT\s+WHERE\s*\{(.*)\}\s*$", re.IGNORECASE | re.DOTALL
)
_AGG_ITEM_RE = re.compile(
    r"\(\s*(COUNT|SUM|MIN|MAX|AVG|SAMPLE|GROUP_CONCAT)\s*\(\s*(DISTINCT\s+)?(\*|\?\w+)\s*"
    r'(?:;\s*SEPARATOR\s*=\s*"((?:[^"\\]|\\.)*)")?\s*\)\s+AS\s+\?(\w+)\s*\)',
    re.IGNORECASE,
)
_VAR_ITEM_RE = re.compile(r"\?(\w+)")
_GROUPBY_RE = re.compile(r"GROUP\s+BY\s+((?:\?\w+\s*)+)", re.IGNORECASE)
_ORDERBY_RE = re.compile(
    r"ORDER\s+BY\s+(.+?)(?=\bLIMIT\b|\bGROUP\b|\bOFFSET\b|\bHAVING\b|$)",
    re.IGNORECASE | re.DOTALL,
)
# an ORDER BY item: optional ASC()/DESC() wrapper around a plain
# variable OR an inline aggregate (r6d — ORDER BY DESC(COUNT(?s)));
# the conditional group closes the wrapper paren only when opened
_ORDER_ITEM_RE = re.compile(
    r"(?:(ASC|DESC)\s*\(\s*)?"
    r"(?:(COUNT|SUM|MIN|MAX|AVG|SAMPLE)\s*\(\s*(DISTINCT\s+)?(\*|\?\w+)\s*\)"
    r"|\?(\w+))"
    r"(?(1)\s*\))",
    re.IGNORECASE,
)
_LIMIT_RE = re.compile(r"LIMIT\s+(\d+)", re.IGNORECASE)
_OFFSET_RE = re.compile(r"OFFSET\s+(\d+)", re.IGNORECASE)
# one HAVING comparison leaf: AGG(?v) / COUNT(*) / ?alias vs a numeric
# constant; leaves combine with && || ! and parens (r6d)
_HAVING_LEAF_RE = re.compile(
    r"\s*(?:(COUNT|SUM|MIN|MAX|AVG)\s*\(\s*(DISTINCT\s+)?(\*|\?\w+)\s*\)|\?(\w+))"
    r"\s*(!=|<=|>=|=|<|>)\s*(-?\d+(?:\.\d+)?)",
    re.IGNORECASE,
)

# IRIs contain no whitespace/angle brackets, so `< 3` in a FILTER can
# never be mistaken for an IRI opener
_TOKEN_RE = re.compile(
    r"""(?P<lbrace>\{) | (?P<rbrace>\}) | (?P<lparen>\() | (?P<rparen>\)) |
        (?P<kw>OPTIONAL|UNION|FILTER|MINUS|VALUES|BIND|AS)\b |
        \?(?P<var>\w+) | (?P<qmark>\?) | <(?P<iri>[^<>\s]+)> |
        "(?P<lit>(?:[^"\\]|\\.)*)" |
        (?P<num>-?\d+(?:\.\d+)?) |
        (?P<oror>\|\|) | (?P<dtsep>\^\^) |
        @(?P<langtag>[A-Za-z][A-Za-z0-9-]*) |
        (?P<op>!=|<=|>=|=|<|>|&&) | (?P<bang>!) |
        (?P<arith>[+*/-]) | (?P<comma>,) | (?P<semi>;) |
        (?P<lbracket>\[) | (?P<rbracket>\]) |
        (?P<alt>\|) | (?P<caret>\^) |
        (?P<pname>\w*:\w+) |
        (?P<ident>[A-Za-z_]\w*) |
        (?P<dot>\.)
    """,
    re.VERBOSE | re.IGNORECASE,
)


_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_RDF_TYPE_IRI = _RDF_NS + "type"
_RDF_FIRST = _RDF_NS + "first"
_RDF_REST = _RDF_NS + "rest"
_RDF_NIL = _RDF_NS + "nil"


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
    if pname is None:
        raise SparqlError(f"expected a term, got {tok.group(0)!r}")
    pfx, local = pname.split(":", 1)
    if pfx == "_":
        # `_:label` — a blank node label acts as a variable scoped to
        # the query (§4.1.4); the `__` prefix keeps it out of
        # projections and cross-(sub)query joins (all `__` columns
        # drop at _compile end)
        return "?__bnlbl_" + local
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

    Group items: ("t", (s,p,o)) | ("filter", [comp, ...]) with comp =
    ("cmp", var, op, rhs, rhs_kind) or ("regex", var, pattern) |
    ("union", groupA, groupB) | ("optional", group) | ("minus", group)
    | ("values", [vars], [rows]) | ("bind", var, expr_ast)."""

    def __init__(self, toks: List[re.Match], prefixes: dict, text: str = ""):
        self.toks = toks
        self.prefixes = prefixes
        self.text = text  # raw block — subquery spans are re-parsed from it
        self.i = 0
        self._bn = 0  # fresh `[...]` anonymous-node counter

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
            if k == "ident" and tok.group("ident").upper() == "GRAPH":
                self.next()
                gterm = _term_of(self.next(), self.prefixes)
                self.expect("lbrace")
                g = self.group()
                self.expect("rbrace")
                items.append(("graph", gterm, g))
                continue
            if k == "kw":
                kw = tok.group("kw").upper()
                self.next()
                if kw == "FILTER":
                    nxt = self.peek()
                    if nxt is not None and _kind(nxt) == "ident" and nxt.group(
                        "ident"
                    ).upper() in ("EXISTS", "NOT"):
                        items.append(self._filter_exists())
                    elif nxt is not None and _kind(nxt) == "ident":
                        # unparenthesized builtin-call form:
                        # FILTER regex(...) / FILTER isLiteral(?x) / ...
                        items.append(("filter", self._bool_primary()))
                    else:
                        items.append(("filter", self._filter()))
                elif kw == "OPTIONAL":
                    self.expect("lbrace")
                    g = self.group()
                    self.expect("rbrace")
                    items.append(("optional", g))
                elif kw == "MINUS":
                    self.expect("lbrace")
                    g = self.group()
                    self.expect("rbrace")
                    items.append(("minus", g))
                elif kw == "VALUES":
                    items.append(self._values())
                elif kw == "BIND":
                    items.append(self._bind())
                elif kw == "AS":
                    raise SparqlError("AS outside a BIND expression")
                else:
                    raise SparqlError("UNION must follow a braced group")
                continue
            if k == "lbrace":
                self.next()
                nxt = self.peek()
                if nxt is not None and _kind(nxt) == "ident" and nxt.group(
                    "ident"
                ).upper() == "SELECT":
                    items.append(("subquery", _parse(self._subquery_text(),
                                                      self.prefixes)))
                    continue
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
            # otherwise: a triple pattern — subject, property PATH
            # (single predicate, `p+` closure, `p1/p2` sequence),
            # object — with the Turtle-style `;` predicate-object list
            # and `,` object list sugar, `[ ... ]` blank-node property
            # lists, and `_:label` (r6d)
            was_node = (
                self.peek() is not None
                and _kind(self.peek()) in ("lbracket", "lparen")
            )
            s = self._term(items)
            nxt = self.peek()
            if was_node and (
                nxt is None or _kind(nxt) in ("rbrace", "dot")
            ):
                # `[ :p :o ] .` / `( :a :b ) .` — a TriplesNode subject
                # may carry an empty outer property list
                continue
            self._property_list(items, s)

    def _property_list(self, items: list, s: str) -> None:
        """Verb ObjectList ( ';' ( Verb ObjectList )? )* for one
        subject term."""
        while True:
            path_ast = self._path()
            while True:
                o = self._term(items)
                self._emit_triple(items, s, path_ast, o)
                tok = self.peek()
                if tok is not None and _kind(tok) == "comma":
                    self.next()
                    continue
                break
            tok = self.peek()
            if tok is not None and _kind(tok) == "semi":
                self.next()
                nxt = self.peek()
                # a trailing `;` before `.` / `}` / `]` / end is legal
                while nxt is not None and _kind(nxt) == "semi":
                    self.next()
                    nxt = self.peek()
                if nxt is None or _kind(nxt) in ("rbrace", "dot", "rbracket"):
                    return
                continue
            return

    def _term(self, items: list) -> str:
        """A subject/object term — or a `[ ... ]` blank-node property
        list, which allocates a fresh anonymous variable (the `__`
        prefix keeps it unprojectable and query-scoped) and appends
        its inner triples to the current group."""
        tok = self.peek()
        if tok is not None and _kind(tok) == "lbracket":
            self.next()
            var = f"?__bnl{self._bn}"
            self._bn += 1
            nxt = self.peek()
            if nxt is not None and _kind(nxt) == "rbracket":
                self.next()
                return var
            self._property_list(items, var)
            self.expect("rbracket")
            return var
        if tok is not None and _kind(tok) == "lparen":
            # RDF collection `( e1 e2 ... )` — desugars to the
            # rdf:first/rest chain the KG parse pipeline itself emits
            # for YAML lists; `()` is rdf:nil (r6d)
            self.next()
            elems = []
            while True:
                nxt = self.peek()
                if nxt is None:
                    raise SparqlError("unterminated collection in pattern")
                if _kind(nxt) == "rparen":
                    self.next()
                    break
                elems.append(self._term(items))
            if not elems:
                return _RDF_NIL
            head = prev = None
            for e in elems:
                node = f"?__bnl{self._bn}"
                self._bn += 1
                if prev is None:
                    head = node
                else:
                    items.append(("t", (prev, _RDF_REST, node)))
                items.append(("t", (node, _RDF_FIRST, e)))
                prev = node
            items.append(("t", (prev, _RDF_REST, _RDF_NIL)))
            return head
        tok2 = self.peek()
        if (
            tok2 is not None
            and _kind(tok2) == "ident"
            and tok2.group("ident") in ("true", "false")
        ):
            # boolean literals (lowercase per grammar) — the engine
            # stores their lexical forms
            self.next()
            return tok2.group("ident")
        base_tok = self.next()
        term = _term_of(base_tok, self.prefixes)
        nxt = self.peek()
        if nxt is not None and _kind(nxt) == "dtsep":
            # `"lex"^^<dt>` — a typed literal constrains BOTH the
            # lexical form and the stored datatype (r6d); only valid
            # after a quoted literal, and only in object position
            # (enforced at emit time)
            if _kind(base_tok) != "lit":
                raise SparqlError("^^ datatype tag needs a quoted literal")
            self.next()
            dt = _term_of(self.next(), self.prefixes)
            return ("typedlit", term, dt)
        if nxt is not None and _kind(nxt) == "langtag":
            # the engine's data model has no language tags (the YAML
            # dialect never produces them) — loud, not wrong
            raise SparqlError(
                "language-tagged literals are outside the engine's data model"
            )
        return term

    def _emit_triple(self, items: list, s: str, path_ast, o: str) -> None:
        if isinstance(s, tuple):
            raise SparqlError("a typed literal cannot be a subject")
        if isinstance(o, tuple) and not (
            path_ast[0] == "link"
            or (path_ast[0] == "inv" and path_ast[1][0] == "link")
        ):
            raise SparqlError(
                "typed literals are only supported as plain-pattern objects"
            )
        if path_ast[0] == "link":
            # single plain atom = a BGP pattern
            items.append(("t", (s, path_ast[1], o)))
        elif path_ast[0] == "inv" and path_ast[1][0] == "link":
            # ^p just swaps ends — a typed literal may not take the
            # subject slot
            if isinstance(o, tuple):
                raise SparqlError("a typed literal cannot be a subject")
            items.append(("t", (o, path_ast[1][1], s)))
        else:
            items.append(("path", s, path_ast, o))

    def _subquery_text(self) -> str:
        """The already-consumed '{' opened a nested SELECT: slice its
        balanced-brace span out of the raw block text and advance past
        the matching '}' — the span re-enters the full SELECT pipeline
        (projection, aggregates, modifiers) at compile time."""
        start_tok = self.toks[self.i]
        depth, j = 1, self.i
        while j < len(self.toks):
            kj = _kind(self.toks[j])
            if kj == "lbrace":
                depth += 1
            elif kj == "rbrace":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if depth != 0:
            raise SparqlError("unbalanced braces in subquery")
        text = self.text[start_tok.start(): self.toks[j].start()]
        self.i = j + 1
        return text

    def _filter_exists(self) -> tuple:
        """``FILTER EXISTS { ... }`` / ``FILTER NOT EXISTS { ... }`` —
        compiled to a left-semi / left-anti join on the shared
        variables."""
        tok = self.next()
        positive = True
        if tok.group("ident").upper() == "NOT":
            positive = False
            tok = self.next()
            if _kind(tok) != "ident" or tok.group("ident").upper() != "EXISTS":
                raise SparqlError("expected EXISTS after FILTER NOT")
        self.expect("lbrace")
        g = self.group()
        self.expect("rbrace")
        return ("exists", g, positive)

    def _filter(self):
        """``FILTER ( expr )`` — a boolean expression AST with ``||``
        (lowest precedence), ``&&``, ``!``, parenthesized sub-
        expressions, comparisons, ``IN`` / ``NOT IN``, ``bound()``,
        ``regex()``, ``isIRI()``/``isURI()``, ``isLiteral()``,
        ``isBlank()``, and the ``STR()`` / ``LANG()`` / ``DATATYPE()``
        accessors plus binary arithmetic as comparison operands
        (rdflib accepts all of these; reference core.py:1321-1340)."""
        self.expect("lparen")
        ast = self._bool_or()
        self.expect("rparen")
        return ast

    def _bool_or(self):
        parts = [self._bool_and()]
        while True:
            tok = self.peek()
            if tok is None or _kind(tok) != "oror":
                break
            self.next()
            parts.append(self._bool_and())
        return parts[0] if len(parts) == 1 else ("or", parts)

    def _bool_and(self):
        parts = [self._bool_unary()]
        while True:
            tok = self.peek()
            if tok is None or _kind(tok) != "op" or tok.group("op") != "&&":
                break
            self.next()
            parts.append(self._bool_unary())
        return parts[0] if len(parts) == 1 else ("and", parts)

    def _bool_unary(self):
        tok = self.peek()
        if tok is not None and _kind(tok) == "bang":
            self.next()
            return ("not", self._bool_unary())
        if tok is not None and _kind(tok) == "lparen":
            # ambiguous: '(' opens either a boolean sub-expression or a
            # parenthesized arithmetic operand — try boolean first and
            # backtrack ((?a + 1) > 2 parses via the operand route)
            mark = self.i
            self.next()
            try:
                inner = self._bool_or()
                self.expect("rparen")
                return inner
            except SparqlError:
                self.i = mark
        return self._bool_primary()

    _BOOL_FNS = {
        "isiri": "isiri",
        "isuri": "isiri",
        "isliteral": "isliteral",
        "isblank": "isblank",
    }

    def _bool_primary(self):
        tok = self.peek()
        if tok is not None and _kind(tok) == "ident":
            name = tok.group("ident").lower()
            if name == "bound":
                self.next()
                self.expect("lparen")
                var_tok = self.expect("var")
                self.expect("rparen")
                return ("bound", "?" + var_tok.group("var"))
            if name == "regex":
                self.next()
                self.expect("lparen")
                arg = self._operand()
                pat_tok = self.next()
                if _kind(pat_tok) == "comma":
                    pat_tok = self.next()
                if _kind(pat_tok) != "lit":
                    raise SparqlError("regex() pattern must be a string literal")
                self.expect("rparen")
                return ("regex", arg, pat_tok.group("lit").replace('\\"', '"'))
            if name in self._BOOL_FNS:
                self.next()
                self.expect("lparen")
                var_tok = self.expect("var")
                self.expect("rparen")
                return (self._BOOL_FNS[name], "?" + var_tok.group("var"))
            if name == "sameterm":
                # dedicated node (NOT a plain cmp): sameTerm compares
                # lexical forms — never the numeric try_cast coercion —
                # and folds in the literal-vs-IRI companion flag when
                # both operands carry one (spec: a literal is never
                # sameTerm-equal to an IRI, whatever its string)
                self.next()
                self.expect("lparen")
                a = self._operand()
                t = self.peek()
                if t is not None and _kind(t) == "comma":
                    self.next()
                b = self._operand()
                self.expect("rparen")
                for side in (a, b):
                    if side[0] not in ("var", "num", "str", "iri"):
                        raise SparqlError(
                            "sameTerm() operands must be variables or "
                            "constant terms"
                        )
                return ("sameterm", a, b)
            if name in ("strstarts", "strends", "contains", "langmatches"):
                self.next()
                self.expect("lparen")
                arg = self._operand()
                t = self.next()
                if _kind(t) == "comma":
                    t = self.next()
                if _kind(t) != "lit":
                    raise SparqlError(
                        f"{name}() second argument must be a string literal"
                    )
                self.expect("rparen")
                return (name, arg, t.group("lit").replace('\\"', '"'))
            if name == "isnumeric":
                self.next()
                self.expect("lparen")
                var_tok = self.expect("var")
                self.expect("rparen")
                return ("isnumeric", "?" + var_tok.group("var"))
        lhs = self._operand()
        nxt = self.peek()
        if nxt is not None and _kind(nxt) == "op" and nxt.group("op") != "&&":
            op = self.next().group("op")
            return ("cmp", lhs, op, self._operand())
        if nxt is not None and _kind(nxt) == "ident" and nxt.group("ident").upper() in ("IN", "NOT"):
            positive = self.next().group("ident").upper() == "IN"
            if not positive:
                t = self.next()
                if _kind(t) != "ident" or t.group("ident").upper() != "IN":
                    raise SparqlError("expected IN after NOT in FILTER")
            self.expect("lparen")
            consts = []
            while True:
                t = self.next()
                if _kind(t) == "rparen":
                    break
                if _kind(t) == "comma":
                    continue
                if _kind(t) == "var":
                    # a variable in the list would otherwise be treated
                    # as the literal string "?w" (always-false filter) —
                    # loud-failure principle: raise instead
                    raise SparqlError(
                        "IN list members must be constant terms, got "
                        f"?{t.group('var')} (compare variables with =)"
                    )
                consts.append(_term_of(t, self.prefixes))
            return ("in", lhs, consts, positive)
        raise SparqlError(
            "expected comparison operator after FILTER variable "
            "(or IN / a boolean function)"
        )

    # single-argument term accessors (generalized to expression args
    # except lang/datatype, which read per-variable term metadata)
    _OPERAND_FNS = (
        "str", "lang", "datatype", "strlen", "ucase", "lcase",
        "md5", "sha1", "sha256", "encode_for_uri", "tz", "iri", "uri",
    )
    _NUM_FNS = ("abs", "ceil", "floor", "round")
    # xsd:dateTime component accessors over the lexical form
    _DT_FNS = ("year", "month", "day", "hours", "minutes", "seconds")

    def _operand(self):
        node = self._mul_operand()
        while True:
            tok = self.peek()
            if tok is None or _kind(tok) != "arith" or tok.group("arith") not in "+-":
                return node
            op = self.next().group("arith")
            node = ("arith", node, op, self._mul_operand())

    def _mul_operand(self):
        node = self._operand_atom()
        while True:
            tok = self.peek()
            if tok is None or _kind(tok) != "arith" or tok.group("arith") not in "*/":
                return node
            op = self.next().group("arith")
            node = ("arith", node, op, self._operand_atom())

    def _skip_comma(self):
        t = self.peek()
        if t is not None and _kind(t) == "comma":
            self.next()

    def _operand_atom(self):
        tok = self.next()
        k = _kind(tok)
        if k == "var":
            return ("var", "?" + tok.group("var"))
        if k == "num":
            return ("num", tok.group("num"))
        if k == "lit":
            return ("str", tok.group("lit").replace('\\"', '"'))
        if k in ("iri", "pname"):
            # distinct kind: sameTerm() needs literal-vs-IRI to be
            # distinguishable for constant operands
            return ("iri", _term_of(tok, self.prefixes))
        if k == "lparen":
            node = self._operand()
            self.expect("rparen")
            return node
        if k == "ident":
            name = tok.group("ident").lower()
            if name in self._OPERAND_FNS:
                self.expect("lparen")
                if name in ("lang", "datatype"):
                    # metadata accessors ride on per-variable companion
                    # columns — the argument must be a plain variable
                    var_tok = self.expect("var")
                    arg = ("var", "?" + var_tok.group("var"))
                else:
                    arg = self._operand()
                self.expect("rparen")
                return ("fn", name, arg)
            if name == "now":
                self.expect("lparen")
                self.expect("rparen")
                return ("now",)
            if name in self._NUM_FNS:
                self.expect("lparen")
                arg = self._operand()
                self.expect("rparen")
                return ("numfn", name, arg)
            if name in self._DT_FNS:
                self.expect("lparen")
                arg = self._operand()
                self.expect("rparen")
                return ("dtfn", name, arg)
            if name in ("strbefore", "strafter"):
                self.expect("lparen")
                arg = self._operand()
                self._skip_comma()
                t = self.next()
                if _kind(t) != "lit":
                    raise SparqlError(
                        f"{name}() second argument must be a string literal"
                    )
                self.expect("rparen")
                return (name, arg, t.group("lit").replace('\\"', '"'))
            if name == "substr":
                self.expect("lparen")
                arg = self._operand()
                self._skip_comma()
                start_tok = self.expect("num")
                length = None
                nxt = self.peek()
                if nxt is not None and _kind(nxt) in ("comma", "num"):
                    self._skip_comma()
                    length = int(self.expect("num").group("num"))
                self.expect("rparen")
                return ("substr", arg, int(start_tok.group("num")), length)
            if name == "replace":
                # SPARQL REPLACE is regex-based and replaces every match
                self.expect("lparen")
                arg = self._operand()
                self._skip_comma()
                pat = self.expect("lit").group("lit").replace('\\"', '"')
                self._skip_comma()
                rep = self.expect("lit").group("lit").replace('\\"', '"')
                self.expect("rparen")
                return ("replace", arg, pat, rep)
            if name == "concat":
                self.expect("lparen")
                args = [self._operand()]
                while True:
                    t = self.peek()
                    if t is not None and _kind(t) == "comma":
                        self.next()
                        args.append(self._operand())
                    else:
                        break
                self.expect("rparen")
                return ("concat", args)
            if name == "coalesce":
                self.expect("lparen")
                args = [self._operand()]
                while True:
                    t = self.peek()
                    if t is not None and _kind(t) == "comma":
                        self.next()
                        args.append(self._operand())
                    else:
                        break
                self.expect("rparen")
                return ("coalesce", args)
            if name == "if":
                # IF(boolean-expr, then, else) — the condition is a full
                # FILTER boolean expression; a NULL (type-error)
                # condition yields NULL, per SPARQL's error propagation
                self.expect("lparen")
                cond = self._bool_or()
                self._skip_comma()
                a = self._operand()
                self._skip_comma()
                b = self._operand()
                self.expect("rparen")
                return ("ifexpr", cond, a, b)
            if name == "timezone":
                self.expect("lparen")
                arg = self._operand()
                self.expect("rparen")
                return ("tzfn", arg)
            if name in ("strlang", "strdt"):
                # dialect (module doc): terms are lexical strings with
                # no language/datatype channel on BIND results, so both
                # constructors yield the lexical form of arg1; the tag/
                # datatype argument is parsed (and must be well-formed)
                # but cannot attach — DATATYPE()/LANG() over the result
                # keep their loud companion-column boundary
                self.expect("lparen")
                arg = self._operand()
                self._skip_comma()
                t = self.next()
                if name == "strlang" and _kind(t) != "lit":
                    raise SparqlError(
                        "STRLANG() second argument must be a string literal"
                    )
                if name == "strdt" and _kind(t) not in ("iri", "pname"):
                    raise SparqlError("STRDT() second argument must be an IRI")
                self.expect("rparen")
                return ("fn", "str", arg)
            if name in ("rand", "uuid", "struuid", "bnode"):
                self.expect("lparen")
                nxt = self.peek()
                if nxt is not None and _kind(nxt) != "rparen":
                    # BNODE(str) needs a per-(label, solution) stable
                    # node id the engine does not track — loud, not wrong
                    raise SparqlError(f"{name.upper()}() takes no arguments")
                self.expect("rparen")
                return (name,)
        raise SparqlError(f"expected a FILTER operand, got {tok.group(0)!r}")

    def _path_neg_member(self):
        """A member of a negated property set: concrete ``p`` or
        ``^p`` (SPARQL 1.1 §9.1 PathOneInPropertySet)."""
        inv = False
        nxt = self.peek()
        if nxt is not None and _kind(nxt) == "caret":
            self.next()
            inv = True
        term = _term_of(self.next(), self.prefixes)
        if term.startswith("?"):
            raise SparqlError("negated property sets need concrete predicates")
        return (term, inv)

    def _path_primary(self):
        """PathPrimary: ``iri`` | ``!set`` | ``( Path )`` — the full
        recursive grammar, so groups nest under modifiers/inverse."""
        nxt = self.peek()
        if nxt is not None and _kind(nxt) == "bang":
            self.next()
            nxt = self.peek()
            members = []
            if nxt is not None and _kind(nxt) == "lparen":
                self.next()
                members.append(self._path_neg_member())
                while True:
                    t = self.peek()
                    if t is None or _kind(t) != "alt":
                        break
                    self.next()
                    members.append(self._path_neg_member())
                self.expect("rparen")
            else:
                members.append(self._path_neg_member())
            return ("neg", members)
        if nxt is not None and _kind(nxt) == "lparen":
            self.next()
            sub = self._path()
            self.expect("rparen")
            return sub
        if (
            nxt is not None
            and _kind(nxt) == "ident"
            and nxt.group("ident") == "a"
        ):
            # the `a` shorthand for rdf:type (case-sensitive per
            # grammar — `A` is a plain identifier)
            self.next()
            return ("link", _RDF_TYPE_IRI)
        return ("link", _term_of(self.next(), self.prefixes))

    def _path_elt(self):
        """PathEltOrInverse: ``^``? PathPrimary PathMod? — per the
        grammar ``^p+`` parses as ``^(p+)`` (equivalent edge set)."""
        inv = False
        nxt = self.peek()
        if nxt is not None and _kind(nxt) == "caret":
            self.next()
            inv = True
        prim = self._path_primary()
        nxt = self.peek()
        if nxt is not None and (
            (_kind(nxt) == "arith" and nxt.group("arith") in "+*")
            or _kind(nxt) == "qmark"
        ):
            mod = "?" if _kind(nxt) == "qmark" else nxt.group("arith")
            self.next()
            if prim[0] == "link" and prim[1].startswith("?"):
                raise SparqlError("path modifiers need a concrete predicate")
            prim = ("mod", prim, mod)
        if inv:
            if prim[0] == "link" and prim[1].startswith("?"):
                raise SparqlError("`^` inverse needs a concrete predicate")
            prim = ("inv", prim)
        return prim

    def _path_seq(self):
        """PathSequence: elt ('/' elt)* — ``/`` binds tighter than
        ``|`` (SPARQL 1.1 §18.2.2: ``a|b/c`` is ``a|(b/c)``)."""
        elts = [self._path_elt()]
        while True:
            nxt = self.peek()
            if nxt is None or _kind(nxt) != "arith" or nxt.group("arith") != "/":
                break
            self.next()
            elts.append(self._path_elt())
        return elts[0] if len(elts) == 1 else ("seq", elts)

    def _path(self):
        """Property path in predicate position — the COMPLETE SPARQL
        1.1 §9.1 grammar: ``p``, ``^path``, ``p+``/``p*``/``p?``,
        alternatives ``|``, sequences ``/``, parenthesized groups
        nesting under any modifier (``(p1/p2)+``, ``^(p|q)``), and
        negated property sets ``!p`` / ``!(p1|^p2|…)``. Returns a
        recursive AST of ``("link", iri)``, ``("inv", sub)``,
        ``("seq", [sub…])``, ``("alt", [sub…])``, ``("mod", sub,
        '+'|'*'|'?')``, ``("neg", [(iri, inverse)…])``. A variable
        predicate is allowed only as the entire path (plain BGP);
        the spec forbids variables inside paths."""
        alts = [self._path_seq()]
        while True:
            nxt = self.peek()
            if nxt is None or _kind(nxt) != "alt":
                break
            self.next()
            alts.append(self._path_seq())
        ast = alts[0] if len(alts) == 1 else ("alt", alts)
        if ast[0] != "link" and _path_has_var(ast):
            raise SparqlError("variable predicates not allowed in property paths")
        return ast

    def _values(self) -> tuple:
        """VALUES ?x { t1 t2 ... }  |  VALUES (?x ?y) { (a b) (c UNDEF) }
        — ``UNDEF`` leaves that variable unconstrained for the row
        (parsed to None; the compiler groups rows by defined-mask)."""

        def term_or_undef(t):
            if _kind(t) == "ident" and t.group("ident").upper() == "UNDEF":
                return None
            return _term_of(t, self.prefixes)

        tok = self.next()
        if _kind(tok) == "var":
            names = ["?" + tok.group("var")]
            self.expect("lbrace")
            rows = []
            while True:
                t = self.next()
                if _kind(t) == "rbrace":
                    break
                rows.append((term_or_undef(t),))
        elif _kind(tok) == "lparen":
            names = []
            while True:
                t = self.next()
                if _kind(t) == "rparen":
                    break
                if _kind(t) != "var":
                    raise SparqlError("VALUES header must list ?variables")
                names.append("?" + t.group("var"))
            if not names:
                raise SparqlError("VALUES needs at least one variable")
            self.expect("lbrace")
            rows = []
            while True:
                t = self.next()
                if _kind(t) == "rbrace":
                    break
                if _kind(t) != "lparen":
                    raise SparqlError("VALUES rows must be parenthesized tuples")
                row = []
                while True:
                    rt = self.next()
                    if _kind(rt) == "rparen":
                        break
                    row.append(term_or_undef(rt))
                if len(row) != len(names):
                    raise SparqlError(
                        f"VALUES row has {len(row)} terms for {len(names)} variables"
                    )
                rows.append(tuple(row))
        else:
            raise SparqlError("VALUES expects ?var or (?v1 ?v2 ...)")
        if not rows:
            raise SparqlError("VALUES block has no rows")
        return ("values", names, rows)

    def _bind(self) -> tuple:
        """``BIND ( expr AS ?v )`` — the full r6 operand grammar
        (arithmetic, SUBSTR/REPLACE/CONCAT, ABS/CEIL/FLOOR/ROUND,
        COALESCE/IF, STR/STRLEN/UCASE/LCASE, ...), mirroring the
        reference's rdflib-evaluated BIND (core.py:1321-1340)."""
        self.expect("lparen")
        expr = self._operand()
        nxt = self.next()
        if _kind(nxt) != "kw" or nxt.group("kw").upper() != "AS":
            raise SparqlError("BIND expects `AS ?var` after the expression")
        var_tok = self.expect("var")
        self.expect("rparen")
        return ("bind", "?" + var_tok.group("var"), expr)


def _parse_projection(proj: str, prefixes: dict | None = None):
    """SELECT items: plain ``?var``, ``(AGG(...) AS ?alias)``, or a
    value expression ``(expr AS ?alias)`` (SPARQL 1.1 §18.2.4.4 —
    computed over the bound variables; with aggregates present, over
    the group keys and aggregate aliases). Returns [("var", name) |
    ("agg", fn, distinct, arg, alias, sep) | ("expr", ast, alias),
    ...]."""
    items, pos = [], 0
    proj = proj.strip()
    if proj == "*":
        # SELECT *: all in-scope variables, resolved at compile time
        return [("star",)]
    while pos < len(proj):
        if proj[pos].isspace():
            pos += 1
            continue
        m = _AGG_ITEM_RE.match(proj, pos)
        if m:
            fn, dist, arg, sep, alias = m.groups()
            items.append(
                ("agg", fn.upper(), bool(dist), arg, alias,
                 sep.replace('\\"', '"') if sep is not None else None)
            )
            pos = m.end()
            continue
        if proj[pos] == "(":
            # (expr AS ?alias): slice the balanced-paren span, re-parse
            # its inside with the operand grammar
            depth, j = 0, pos
            while j < len(proj):
                if proj[j] == "(":
                    depth += 1
                elif proj[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if depth != 0:
                raise SparqlError(f"unbalanced parens in SELECT item: {proj[pos:]!r}")
            span = proj[pos + 1 : j]
            p = _Parser(_tokenize(span), prefixes or {}, span)
            ast = p._operand()
            as_tok = p.peek()
            if (
                as_tok is None
                or _kind(as_tok) != "kw"
                or as_tok.group("kw").upper() != "AS"
            ):
                raise SparqlError(
                    f"SELECT expression needs `AS ?alias`: ({span})"
                )
            p.next()
            alias = p.expect("var").group("var")
            if p.peek() is not None:
                raise SparqlError(f"trailing tokens in SELECT item: ({span})")
            items.append(("expr", ast, alias))
            pos = j + 1
            continue
        m = _VAR_ITEM_RE.match(proj, pos)
        if m:
            items.append(("var", m.group(1)))
            pos = m.end()
            continue
        raise SparqlError(f"cannot parse SELECT item at: {proj[pos:]!r}")
    if not items:
        raise SparqlError("SELECT needs at least one ?variable or aggregate")
    return items


def _parse_having(span: str):
    """Boolean HAVING constraint (r6d): comparison leaves
    (``AGG(?v) op number`` / ``?alias op number``) combined with
    ``&&`` / ``||`` / ``!`` and parentheses, standard precedence.
    Returns a tree of ('or'|'and', l, r) / ('not', x) /
    ('cmp', FN|None, distinct, arg, alias, op, const) nodes."""
    pos = 0

    def ws():
        nonlocal pos
        while pos < len(span) and span[pos].isspace():
            pos += 1

    def orx():
        nonlocal pos
        node = andx()
        while True:
            ws()
            if span.startswith("||", pos):
                pos += 2
                node = ("or", node, andx())
            else:
                return node

    def andx():
        nonlocal pos
        node = unary()
        while True:
            ws()
            if span.startswith("&&", pos):
                pos += 2
                node = ("and", node, unary())
            else:
                return node

    def unary():
        nonlocal pos
        ws()
        if span.startswith("!", pos) and not span.startswith("!=", pos):
            pos += 1
            return ("not", unary())
        if span.startswith("(", pos):
            # a leaf never starts with '(' (aggregates start with their
            # keyword, aliases with '?') — this is always a group
            pos += 1
            node = orx()
            ws()
            if not span.startswith(")", pos):
                raise SparqlError(f"unbalanced parens in HAVING: {span!r}")
            pos += 1
            return node
        m = _HAVING_LEAF_RE.match(span, pos)
        if not m:
            raise SparqlError(
                "HAVING supports `AGG(?v) op number` / `?alias op number` "
                f"leaves combined with && || ! — cannot parse {span[pos:]!r}"
            )
        pos = m.end()
        fn, dist, arg, alias, op, const = m.groups()
        return ("cmp", fn.upper() if fn else None, bool(dist), arg, alias,
                op, float(const))

    node = orx()
    ws()
    if pos != len(span):
        raise SparqlError(f"trailing tokens in HAVING: {span[pos:]!r}")
    return node


def _parse_modifiers(tail: str):
    """GROUP BY / HAVING / ORDER BY / LIMIT / OFFSET tail after the
    WHERE block. HAVING (r6d) takes a parenthesized boolean
    combination of aggregate / alias comparisons."""
    group_by, order_by, limit, offset, having = [], [], None, None, None
    rest = tail
    m = re.search(r"\bHAVING\b", rest, re.IGNORECASE)
    if m:
        i = m.end()
        while i < len(rest) and rest[i].isspace():
            i += 1
        if i >= len(rest) or rest[i] != "(":
            raise SparqlError("HAVING needs a parenthesized constraint")
        depth, j = 0, i
        while j < len(rest):
            if rest[j] == "(":
                depth += 1
            elif rest[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if depth != 0:
            raise SparqlError("unbalanced parens in HAVING")
        having = _parse_having(rest[i + 1 : j])
        rest = rest[: m.start()] + rest[j + 1 :]
    m = _GROUPBY_RE.search(rest)
    if m:
        # position-walk the clause so ANY unconsumed text raises —
        # re.findall silently grabbed the inner variables of
        # `GROUP BY (STR(?x) AS ?s)` as group keys (r6 verdict wrong #1;
        # same bug class as the r5 `IN (?w)` fix: loudly, not wrongly)
        clause, pos, n = m.group(1), 0, len(m.group(1))
        while True:
            while pos < n and clause[pos].isspace():
                pos += 1
            if pos >= n:
                break
            gm = re.compile(r"\?(\w+)").match(clause, pos)
            if gm is None:
                raise SparqlError(
                    f"unsupported GROUP BY key at {clause[pos:].strip()!r}: "
                    f"this dialect groups by plain ?variables only"
                )
            group_by.append(gm.group(1))
            pos = gm.end()
        rest = rest[: m.start()] + rest[m.end():]
    m = _ORDERBY_RE.search(rest)
    if m:
        # same position-walk: `ORDER BY STRLEN(?v)` previously compiled
        # to an ascending sort on ?v and DESC(STRLEN(?v)) dropped the
        # DESC — unconsumed clause text must raise instead
        clause, pos, n = m.group(1), 0, len(m.group(1))
        while True:
            while pos < n and clause[pos].isspace():
                pos += 1
            if pos >= n:
                break
            om = _ORDER_ITEM_RE.match(clause, pos)
            if om is None:
                raise SparqlError(
                    f"unsupported ORDER BY key at {clause[pos:].strip()!r}: "
                    f"this dialect sorts by ?variables or "
                    f"ASC()/DESC() of a variable or inline aggregate"
                )
            direction, fn, dist, arg, var = om.groups()
            desc = direction is not None and direction.upper() == "DESC"
            if var is not None:
                order_by.append((var, desc))
            else:
                # inline aggregate sort key (r6d): resolved to a
                # hidden column in the same groupBy at compile time
                order_by.append((("agg", fn.upper(), bool(dist), arg), desc))
            pos = om.end()
        rest = rest[: m.start()] + rest[m.end():]
    m = _LIMIT_RE.search(rest)
    if m:
        limit = int(m.group(1))
        rest = rest[: m.start()] + rest[m.end():]
    m = _OFFSET_RE.search(rest)
    if m:
        offset = int(m.group(1))
        rest = rest[: m.start()] + rest[m.end():]
    if rest.strip():
        raise SparqlError(f"cannot parse after WHERE block: {rest.strip()!r}")
    return group_by, order_by, limit, offset, having


def _strip_prefixes(src: str):
    prefixes = dict((m.group(1), m.group(2)) for m in _PREFIX_RE.finditer(src))
    return _PREFIX_RE.sub("", src).strip(), prefixes


def _parse_group(body: str, prefixes: dict) -> list:
    parser = _Parser(_tokenize(body), prefixes, body)
    items = parser.group()
    if parser.peek() is not None:
        raise SparqlError(f"trailing tokens: {parser.peek().group(0)!r}")
    if not any(
        k[0] in ("t", "path", "union", "values", "graph", "subquery")
        for k in items
    ):
        raise SparqlError(
            "graph pattern has no required triple patterns "
            "(OPTIONAL/FILTER/BIND alone is not a query)"
        )
    return items


def _parse(src: str, outer_prefixes: dict | None = None):
    if _UNSUPPORTED.search(src):
        raise SparqlError(
            f"unsupported SPARQL construct: {_UNSUPPORTED.search(src).group(0)}"
        )
    prefixes = dict(outer_prefixes or {})
    prefixes.update(
        (m.group(1), m.group(2)) for m in _PREFIX_RE.finditer(src)
    )
    body = src.strip()
    # query-level final VALUES clause (§18.2.4.3, r6d): a trailing
    # `VALUES ?v|( ?a ?b ) { rows }` OUTSIDE every brace pair joins the
    # solutions after grouping/HAVING, before projection and ORDER/
    # LIMIT. Datablocks contain no nested braces, so the span is
    # regular; brace depth (string-literal-aware) distinguishes it
    # from an in-group VALUES at the end of the WHERE block.
    final_values = None
    mv = re.search(
        r"\bVALUES\s+(?:\([^()]*\)|\?\w+)\s*\{[^{}]*\}\s*$",
        body,
        re.IGNORECASE,
    )
    if mv is not None and _brace_depth_at(body, mv.start()) == 0:
        [final_values] = _parse_group(body[mv.start():], prefixes)
        body = body[: mv.start()]
    m = _SELECT_RE.search(body)
    if not m:
        raise SparqlError("expected `SELECT ... WHERE { ... }`")
    select_items = _parse_projection(m.group(2), prefixes)
    group_by, order_by, limit, offset, having = _parse_modifiers(m.group(4) or "")
    items = _parse_group(m.group(3), prefixes)
    return (select_items, items, group_by, order_by, limit, offset, having,
            final_values)


def _relocate_final_values(src: str) -> str:
    """For ASK / CONSTRUCT / DESCRIBE (no grouping stage), a trailing
    query-level VALUES clause is equivalent to the same datablock
    INSIDE the WHERE group — relocate it textually so the form
    regexes (which anchor on the final ``}``) match. Returns ``src``
    unchanged when there is no depth-0 trailing VALUES or the text
    before it does not end in a brace (e.g. a WHERE-less DESCRIBE —
    left to fail loudly downstream)."""
    mv = re.search(
        r"\bVALUES\s+(?:\([^()]*\)|\?\w+)\s*\{[^{}]*\}\s*$", src, re.IGNORECASE
    )
    if mv is None or _brace_depth_at(src, mv.start()) != 0:
        return src
    pre = src[: mv.start()].rstrip()
    if not pre.endswith("}"):
        return src
    return pre[:-1] + " " + src[mv.start():].strip() + " }"


def _brace_depth_at(s: str, idx: int) -> int:
    """Brace nesting depth at position ``idx``, ignoring braces inside
    quoted string literals (same scan discipline as
    :func:`_extract_dataset`)."""
    depth = 0
    in_str: str | None = None
    for i in range(idx):
        ch = s[i]
        if in_str is not None:
            if ch == in_str and s[i - 1] != "\\":
                in_str = None
        elif ch in "\"'":
            in_str = ch
        elif ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
    return depth


def parse_sparql(src: str) -> Tuple[List[str], List[Tuple[str, str, str]]]:
    """Legacy surface: (selected variables, plain triple patterns).
    Raises on FILTER/UNION/OPTIONAL — use :func:`make_query` for those."""
    (select_items, items, group_by, order_by, limit, offset, having,
     final_values) = _parse(src)
    if any(k[0] != "t" for k in items):
        raise SparqlError("query uses FILTER/UNION/OPTIONAL — evaluate via make_query")
    if any(isinstance(term, tuple) for _, pat in items for term in pat):
        raise SparqlError("query uses typed literals — evaluate via make_query")
    if (
        group_by or order_by or limit is not None or offset is not None
        or having or final_values is not None
        or any(it[0] != "var" for it in select_items)
    ):
        raise SparqlError("query uses aggregates/modifiers — evaluate via make_query")
    return ["?" + it[1] for it in select_items], [it[1] for it in items]


# ---------------------------------------------------------------------------
# compilation
# ---------------------------------------------------------------------------

_POS = ("subj", "pred", "obj")


def _pattern_frame(
    triples: DataFrame,
    pat,
    idx: int,
    graph_var: str | None = None,
    meta_remaining: set | None = None,
) -> DataFrame:
    t = triples
    cols = []
    for pos, term in zip(_POS, pat):
        if isinstance(term, tuple):
            # typed literal "lex"^^<dt>: lexical AND datatype must
            # match (a stored NULL datatype reads as xsd:string, the
            # RDF 1.1 plain-literal identification)
            _, lex, dt = term
            t = t.filter(
                (F.col(pos) == lex)
                & (F.coalesce(F.col("obj_datatype"), F.lit(_XSD_STRING)) == dt)
            )
            continue
        if term.startswith("?"):
            cols.append(F.col(pos).alias(term[1:]))
            # a FILTER in this group needs term metadata
            # (DATATYPE()/isIRI()/isLiteral()): bind hidden companion
            # columns at the variable's FIRST object-position binding
            # site only — they must never become join keys (NULL
            # datatypes would silently drop rows in a NULL = NULL join)
            if (
                meta_remaining
                and pos == "obj"
                and term[1:] in meta_remaining
            ):
                meta_remaining.discard(term[1:])
                cols.append(F.col("obj_datatype").alias(f"__dt_{term[1:]}"))
                cols.append(F.col("obj_is_literal").alias(f"__lit_{term[1:]}"))
        else:
            t = t.filter(F.col(pos) == term)
    if graph_var is not None:
        if any(term == "?" + graph_var for term in pat):
            raise SparqlError(
                f"GRAPH variable ?{graph_var} reused inside its own pattern"
            )
        cols.append(F.col("doc_iri").alias(graph_var))
    return t.select(*cols) if cols else t.select(F.lit(1).alias(f"_m{idx}"))


def _identity_frame(triples: DataFrame, s: str, o: str) -> DataFrame:
    """Zero-length-path identity: (t, t) for every term of the graph,
    plus any constant endpoint of this path expression (SPARQL 1.1
    §9.3: a zero-length path from a constant matches the constant
    itself whether or not it occurs in the graph)."""
    nodes = triples.select(F.col("subj").alias("n")).unionByName(
        triples.select(F.col("obj").alias("n"))
    )
    extras = [t for t in (s, o) if not t.startswith("?")]
    if extras:
        nodes = nodes.unionByName(
            arrow_local_df(triples.sparkSession, [(t,) for t in extras], ["n"])
        )
    nodes = nodes.distinct()
    return nodes.select(F.col("n").alias("src"), F.col("n").alias("dst"))


# separator for graph-scoped path nodes: a control char that cannot
# occur in IRIs or YAML-dialect literals used as graph terms
_GSEP = "\x01"


def _path_has_var(ast) -> bool:
    """True when any predicate inside the path AST is a ?variable."""
    kind = ast[0]
    if kind == "link":
        return ast[1].startswith("?")
    if kind == "inv":
        return _path_has_var(ast[1])
    if kind == "mod":
        return _path_has_var(ast[1])
    if kind in ("seq", "alt"):
        return any(_path_has_var(sub) for sub in ast[1])
    return False  # neg members are concrete by construction


def _path_frame(
    triples: DataFrame,
    s: str,
    path_ast: tuple,
    o: str,
    idx: int,
    graph_var: str | None = None,
) -> DataFrame:
    """Compile a property path onto edge joins; ``p+``/``p*`` segments
    become a distributed semi-naive transitive closure
    (operators/closure) — SPARQL 1.1 paths expressed as the
    iterative-DataFrame pattern instead of a recursive evaluator;
    ``p*``/``p?`` union the identity over graph terms. The AST is
    recursive (parser ``_path``), so groups compose under modifiers:
    ``(p1/p2)+`` closes over the JOINED edge relation, ``^(p|q)``
    swaps the unioned frame's endpoints.

    Under ``GRAPH ?g`` (r6) the path must hold WITHIN one named graph:
    nodes travel as ``doc_iri + \\x01 + term`` composed keys, so every
    join and closure step stays graph-local by construction (no
    per-graph loop, one distributed plan); the graph id splits back
    out as the ``?g`` binding at the end."""
    from .closure import transitive_closure

    if graph_var is not None and "?" + graph_var in (s, o):
        raise SparqlError(
            f"GRAPH variable ?{graph_var} reused inside its own pattern"
        )

    def node(col: str):
        if graph_var is None:
            return F.col(col)
        return F.concat(F.col("doc_iri"), F.lit(_GSEP), F.col(col))

    def identity_frame() -> DataFrame:
        if graph_var is None:
            return _identity_frame(triples, s, o)
        # per-graph identity: every term of each graph, plus constant
        # endpoints composed with EVERY graph id (§9.3 relativized)
        nodes = triples.select(node("subj").alias("n")).unionByName(
            triples.select(node("obj").alias("n"))
        )
        extras = [t for t in (s, o) if not t.startswith("?")]
        for t in extras:
            nodes = nodes.unionByName(
                triples.select(
                    F.concat(F.col("doc_iri"), F.lit(_GSEP), F.lit(t)).alias("n")
                )
            )
        nodes = nodes.distinct()
        return nodes.select(F.col("n").alias("src"), F.col("n").alias("dst"))

    seq_counter = [0]

    def edges(ast) -> DataFrame:
        """(src, dst) edge frame for a path AST node, recursively."""
        kind = ast[0]
        if kind == "link":
            return triples.filter(F.col("pred") == ast[1]).select(
                node("subj").alias("src"), node("obj").alias("dst")
            )
        if kind == "inv":
            e = edges(ast[1])
            return e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        if kind == "alt":
            e = None
            for sub in ast[1]:
                f = edges(sub)
                e = f if e is None else e.unionByName(f)
            return e
        if kind == "seq":
            # composition: chain joins on distinct hop names; a fresh
            # counter per seq keeps nested compositions unambiguous
            seq_counter[0] += 1
            n = seq_counter[0]
            cur = None
            for i, sub in enumerate(ast[1]):
                f = edges(sub).select(
                    F.col("src").alias(f"_p{n}_{i}"),
                    F.col("dst").alias(f"_p{n}_{i + 1}"),
                )
                cur = f if cur is None else cur.join(f, f"_p{n}_{i}")
            k = len(ast[1])
            return cur.select(
                F.col(f"_p{n}_0").alias("src"), F.col(f"_p{n}_{k}").alias("dst")
            )
        if kind == "mod":
            e = edges(ast[1])
            if ast[2] == "+":
                return transitive_closure(e)
            if ast[2] == "*":
                return transitive_closure(e).unionByName(identity_frame()).distinct()
            return e.unionByName(identity_frame()).distinct()
        if kind == "neg":
            # negated property set: every edge whose predicate is NOT a
            # set member — ONE filtered scan per direction (isin pushes
            # down), never an anti-join of the edge frame against
            # itself. Per SPARQL 1.1 §9.1, `!(p1|…|^q1|…)` splits into
            # the forward half negating {p1..} and the INVERSE half
            # negating {q1..}, unioned; a half with no members
            # contributes nothing (`!(^q)` is reverse-only)
            fwd = [p for p, inv in ast[1] if not inv]
            rev = [p for p, inv in ast[1] if inv]
            e = None
            if fwd or not rev:
                e = triples.filter(~F.col("pred").isin(fwd)).select(
                    node("subj").alias("src"), node("obj").alias("dst")
                )
            if rev:
                r = triples.filter(~F.col("pred").isin(rev)).select(
                    node("obj").alias("src"), node("subj").alias("dst")
                )
                e = r if e is None else e.unionByName(r)
            return e
        raise SparqlError(f"unknown path node {kind!r}")  # pragma: no cover

    cur = edges(path_ast).select(
        F.col("src").alias(f"_h{idx}_0"), F.col("dst").alias(f"_h{idx}_1")
    )
    first, last = f"_h{idx}_0", f"_h{idx}_1"
    if graph_var is not None:
        # split the composed keys back into (graph, term); first and
        # last necessarily share the graph prefix (joins preserve it)
        cur = cur.withColumn(graph_var, F.substring_index(F.col(first), _GSEP, 1))
        term_first = F.substring_index(F.col(first), _GSEP, -1)
        term_last = F.substring_index(F.col(last), _GSEP, -1)
    else:
        term_first, term_last = F.col(first), F.col(last)
    if s.startswith("?"):
        cur = cur.withColumn(s[1:], term_first)
    else:
        cur = cur.filter(term_first == s)
    if o.startswith("?"):
        if o == s:  # cycle pattern ?x p+ ?x
            cur = cur.filter(term_last == F.col(s[1:]))
        else:
            cur = cur.withColumn(o[1:], term_last)
    else:
        cur = cur.filter(term_last == o)
    keep = [c for c in cur.columns if not c.startswith("_h")]
    return cur.select(*keep).distinct() if keep else cur.select(F.lit(1).alias(f"_m{idx}"))


def _apply_values(spark, df, names, rows):
    """Join a VALUES datablock against ``df`` (or stand alone when
    ``df`` is None) — shared by the in-group compile and the
    query-level final VALUES clause (§18.2.4.3). UNDEF leaves the
    variable unconstrained for that row. When ``df`` carries a
    non-string column of the same name (a final VALUES over an
    aggregate alias), the inline side is try_cast to that type so the
    join never hits an ANSI cast error."""

    def _typed(inline):
        if df is None:
            return inline
        dts = dict(df.dtypes)
        for c in inline.columns:
            dt = dts.get(c)
            if dt is not None and dt != "string":
                inline = inline.withColumn(
                    c, F.expr(f"try_cast(`{c}` AS {dt})")
                )
        # a datablock is typed-in rows — always tiny. Without the hint
        # the parallelized local relation has UNKNOWN stats (Scan
        # ExistingRDD defaults to sizeInBytes=MAX), so Catalyst would
        # SORT-MERGE-JOIN it against the solutions: a full shuffle of
        # the big side per VALUES block at scale (caught by
        # test_final_values_broadcasts_inline_side)
        return F.broadcast(inline)

    cols = [v[1:] for v in names]
    schema = ", ".join(f"`{c}` string" for c in cols)
    if df is None or all(None not in r for r in rows):
        # no UNDEF against an existing frame: one inline
        # relation (standalone UNDEFs become plain NULLs)
        inline = _typed(arrow_local_df(spark, rows, schema))
        return inline if df is None else _merge(df, inline)
    # UNDEF leaves the variable unconstrained for that row:
    # group rows by their defined-column mask, join each
    # group on only those columns, align schemas (missing
    # vars -> NULL) and union — set semantics downstream
    from collections import defaultdict

    groups = defaultdict(list)
    for r in rows:
        groups[tuple(i for i, v in enumerate(r) if v is not None)].append(r)
    parts = []
    for mask, rs in groups.items():
        if not mask:
            parts.append(df)  # the all-UNDEF row keeps every solution
            continue
        sub_cols = [cols[i] for i in mask]
        inline = _typed(
            arrow_local_df(
                spark,
                [tuple(r[i] for i in mask) for r in rs],
                ", ".join(f"`{c}` string" for c in sub_cols),
            )
        )
        parts.append(_merge(df, inline))
    all_cols: list = []
    for p in parts:
        for c in p.columns:
            if c not in all_cols:
                all_cols.append(c)
    aligned = []
    for p in parts:
        missing = [c for c in all_cols if c not in p.columns]
        for c in missing:
            p = p.withColumn(c, F.lit(None).cast("string"))
        aligned.append(p.select(*all_cols))
    u = aligned[0]
    for p in aligned[1:]:
        u = u.unionByName(p)
    return u


def _merge(a: DataFrame, b: DataFrame, how: str = "inner") -> DataFrame:
    shared = [c for c in b.columns if c in a.columns]
    if shared:
        return a.join(b, shared, how)
    return a.crossJoin(b) if how == "inner" else a.join(b, F.lit(True), "left")


_CMP = {
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    ">": lambda a, b: a > b,
    "<=": lambda a, b: a <= b,
    ">=": lambda a, b: a >= b,
}

_ORDERING = {"<", ">", "<=", ">="}

_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

# filter-AST nodes that read term metadata (datatype / literal-ness)
# and therefore need companion columns bound at pattern time
def _collect_meta_vars(ast, out: set) -> None:
    kind = ast[0]
    if kind in ("or", "and"):
        for part in ast[1]:
            _collect_meta_vars(part, out)
    elif kind == "not":
        _collect_meta_vars(ast[1], out)
    elif kind in ("isiri", "isliteral", "isnumeric"):
        out.add(ast[1][1:])
    elif kind == "cmp":
        for side in (ast[1], ast[3]):
            _collect_operand_meta(side, out)
    elif kind == "sameterm":
        # companion literal-flags fold into the term equality when bound
        for side in (ast[1], ast[2]):
            if side[0] == "var":
                out.add(side[1][1:])
    elif kind in (
        "regex", "in", "strstarts", "strends", "contains", "langmatches"
    ):
        _collect_operand_meta(ast[1], out)


def _collect_operand_meta(node, out: set) -> None:
    kind = node[0]
    if kind == "fn":
        if node[1] == "datatype":
            out.add(node[2][1][1:])  # arg is ("var", "?x")
        else:
            _collect_operand_meta(node[2], out)
    elif kind == "arith":
        _collect_operand_meta(node[1], out)
        _collect_operand_meta(node[3], out)
    elif kind in ("substr", "replace", "strbefore", "strafter", "tzfn"):
        _collect_operand_meta(node[1], out)
    elif kind in ("numfn", "dtfn"):
        _collect_operand_meta(node[2], out)
    elif kind in ("concat", "coalesce"):
        for a in node[1]:
            _collect_operand_meta(a, out)
    elif kind == "ifexpr":
        _collect_meta_vars(node[1], out)
        _collect_operand_meta(node[2], out)
        _collect_operand_meta(node[3], out)


def _require_bound(df: DataFrame, var: str) -> None:
    if var[1:] not in df.columns:
        raise SparqlError(f"FILTER on unbound variable {var}")


def _require_meta(df: DataFrame, var: str, what: str) -> None:
    if f"__lit_{var[1:]}" not in df.columns:
        raise SparqlError(
            f"{what} needs {var} bound in object position of a triple "
            f"pattern in the same group"
        )


def _is_numeric_node(node) -> bool:
    return node[0] in ("num", "arith", "numfn", "dtfn")


def _str_col(df: DataFrame, node):
    """Operand compiled to its LEXICAL string form: numeric literals
    keep their typed-in text (``30`` stays "30", never "30.0"), other
    operands are already strings or cast to string."""
    if node[0] == "num":
        return F.lit(node[1])
    return _operand_col(df, node).cast("string")


def _operand_col(df: DataFrame, node):
    kind = node[0]
    if kind == "var":
        _require_bound(df, node[1])
        return F.col(node[1][1:])
    if kind == "num":
        return F.lit(float(node[1]))
    if kind in ("str", "iri"):
        return F.lit(node[1])
    if kind == "now":
        # constant for the whole query (current_timestamp is evaluated
        # once per query per Spark semantics), xsd:dateTime lexical form
        return F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss")
    if kind == "arith":
        a = _operand_col(df, node[1]).try_cast("double")
        b = _operand_col(df, node[3]).try_cast("double")
        return {"+": a + b, "-": a - b, "*": a * b, "/": a / b}[node[2]]
    if kind == "substr":
        _, arg, start, length = node
        base = _str_col(df, arg)
        # SPARQL SUBSTR is 1-based; XPath fn:substring WINDOW semantics
        # for start < 1 (chars at positions max(start,1) .. start+length),
        # not Spark's count-from-the-end negative start (ADVICE r6; the
        # SWRL substring builtin already clamps this way)
        lo = max(start, 1)
        if length is None:
            return F.substring(base, lo, 2147483647)
        n = start + length - lo
        return F.substring(base, lo, n) if n > 0 else F.lit("")
    if kind == "replace":
        # SPARQL REPLACE is regex-based and replaces every match
        return F.regexp_replace(_str_col(df, node[1]), node[2], node[3])
    if kind in ("strbefore", "strafter"):
        # SPARQL 17.4.3.4/5: the part of arg1 before/after the FIRST
        # occurrence of arg2; "" when arg2 does not occur. An empty
        # arg2 matches at position 1 (instr = 1): STRBEFORE → "",
        # STRAFTER → the whole string — both fall out of the same
        # substring arithmetic, no special case
        base = _str_col(df, node[1])
        pos = F.instr(base, node[2])
        if kind == "strbefore":
            return F.when(pos > 0, F.substring(base, 1, pos - 1)).otherwise("")
        return F.when(
            pos > 0, F.substring(base, pos + len(node[2]), F.lit(2147483647))
        ).otherwise("")
    if kind == "dtfn":
        _, fn, arg = node
        ts = F.try_to_timestamp(_str_col(df, arg))
        # bigint-typed (SPARQL integer); a non-dateTime lexical form
        # yields NULL — error propagation, the row drops from filters
        col = {
            "year": F.year, "month": F.month, "day": F.dayofmonth,
            "hours": F.hour, "minutes": F.minute,
        }.get(fn)
        if col is not None:
            return col(ts).cast("bigint")
        # SECONDS is xsd:decimal: fractional seconds must SURVIVE, and
        # Spark's second() truncates to the integer second — extract the
        # seconds field from the lexical form instead (ADVICE r6);
        # a valid timestamp whose lexical form carries no seconds field
        # falls back to the truncating reading rather than NULL
        secs = F.regexp_extract(
            _str_col(df, arg), r"[T ]\d{2}:\d{2}:(\d{2}(?:\.\d+)?)", 1
        )
        return F.when(
            ts.isNotNull(),
            F.coalesce(
                F.nullif(secs, F.lit("")).try_cast("double"),
                F.second(ts).cast("double"),
            ),
        )
    if kind == "concat":
        return F.concat(*[_str_col(df, a) for a in node[1]])
    if kind == "coalesce":
        return F.coalesce(*[_operand_col(df, a) for a in node[1]])
    if kind == "numfn":
        _, fn, arg = node
        x = _operand_col(df, arg).try_cast("double")
        # dialect: numeric functions stay double-typed (CEIL/FLOOR
        # return whole-valued doubles; ROUND rounds half away from zero)
        if fn == "abs":
            return F.abs(x)
        if fn == "ceil":
            return F.ceil(x).cast("double")
        if fn == "floor":
            return F.floor(x).cast("double")
        return F.round(x, 0)
    if kind == "ifexpr":
        _, cond, a, b = node
        c = _filter_col(df, cond)
        # two-branch when (no otherwise): a NULL condition yields NULL
        # — SPARQL error propagation, not the else branch
        return F.when(c, _operand_col(df, a)).when(~c, _operand_col(df, b))
    if kind == "tzfn":
        # TIMEZONE (17.4.5.7): xsd:dayTimeDuration lexical form of the
        # dateTime's offset ("-05:00" → "-PT5H", "+05:30" → "PT5H30M",
        # "Z" → "PT0S"); NULL (type error) when the term has no offset
        tz = F.regexp_extract(
            _str_col(df, node[1]), r"(Z|[+-][0-9]{2}:[0-9]{2})$", 1
        )
        hh = F.substring(tz, 2, 2).try_cast("int")
        mm = F.substring(tz, 5, 2).try_cast("int")
        sign = F.when(F.substring(tz, 1, 1) == "-", F.lit("-")).otherwise(
            F.lit("")
        )
        dur = F.concat(
            sign,
            F.lit("PT"),
            F.when(hh > 0, F.concat(hh.cast("string"), F.lit("H"))).otherwise(""),
            F.when(mm > 0, F.concat(mm.cast("string"), F.lit("M"))).otherwise(""),
        )
        return (
            F.when(tz == "", F.lit(None).cast("string"))
            .when((tz == "Z") | ((hh == 0) & (mm == 0)), F.lit("PT0S"))
            .otherwise(dur)
        )
    if kind == "rand":
        # non-deterministic by spec; double in [0, 1)
        return F.rand()
    if kind == "uuid":
        return F.concat(F.lit("urn:uuid:"), F.expr("uuid()"))
    if kind == "struuid":
        return F.expr("uuid()")
    if kind == "bnode":
        # a fresh blank node per solution (17.4.1.6 zero-arg form)
        return F.concat(F.lit("_:b"), F.expr("replace(uuid(), '-', '')"))
    # ("fn", name, arg_node)
    _, fn, arg = node
    if fn == "str":
        # terms ARE their lexical form / IRI string in this engine
        return _str_col(df, arg)
    if fn == "strlen":
        return F.length(_str_col(df, arg))
    if fn == "ucase":
        return F.upper(_str_col(df, arg))
    if fn == "lcase":
        return F.lower(_str_col(df, arg))
    if fn == "md5":
        return F.md5(_str_col(df, arg).cast("binary"))
    if fn == "sha1":
        return F.sha1(_str_col(df, arg).cast("binary"))
    if fn == "sha256":
        return F.sha2(_str_col(df, arg).cast("binary"), 256)
    if fn == "encode_for_uri":
        # SPARQL 17.4.2.8 / RFC 3986: only ALPHA/DIGIT/-/./_/~ stay
        # unencoded, space is %20. url_encode is the JVM URLEncoder
        # (form encoding) — fix its three divergences: '+' for space,
        # '*' left bare, '~' encoded as %7E
        enc = F.url_encode(_str_col(df, arg))
        enc = F.replace(enc, F.lit("+"), F.lit("%20"))
        enc = F.replace(enc, F.lit("*"), F.lit("%2A"))
        return F.replace(enc, F.lit("%7E"), F.lit("~"))
    if fn == "tz":
        # timezone part of the dateTime LEXICAL form ("" when absent)
        return F.regexp_extract(
            _str_col(df, arg), r"(Z|[+-][0-9]{2}:[0-9]{2})$", 1
        )
    if fn in ("iri", "uri"):
        # terms are lexical strings in this engine: IRI() passes the
        # string through; no companion metadata attaches to the result
        # (isIRI() over a BIND of it raises, keeping the boundary loud)
        return _str_col(df, arg)
    var = arg[1]  # lang/datatype: parse-time guaranteed ("var", "?x")
    _require_bound(df, var)
    if fn == "lang":
        # the YAML dialect has no language-tagged literals (module doc):
        # LANG() is "" for every plain literal, as SPARQL specifies
        return F.lit("")
    # DATATYPE: xsd:string for plain literals (RDF 1.1), NULL (=type
    # error, row drops out of any comparison) for IRIs/blank nodes
    _require_meta(df, var, "DATATYPE()")
    name = var[1:]
    return F.when(
        F.col(f"__lit_{name}"),
        F.coalesce(F.col(f"__dt_{name}"), F.lit(_XSD_STRING)),
    ).otherwise(F.lit(None).cast("string"))


def _filter_col(df: DataFrame, ast):
    """Compile a FILTER expression AST to a boolean Column."""
    kind = ast[0]
    if kind == "or":
        cond = _filter_col(df, ast[1][0])
        for part in ast[1][1:]:
            cond = cond | _filter_col(df, part)
        return cond
    if kind == "and":
        cond = _filter_col(df, ast[1][0])
        for part in ast[1][1:]:
            cond = cond & _filter_col(df, part)
        return cond
    if kind == "not":
        inner = ast[1]
        # (!)bound keeps its NULL-aware semantics instead of three-valued
        # negation: !bound(?y) must be TRUE for OPTIONAL's NULLs
        if inner[0] == "bound":
            if inner[1][1:] not in df.columns:
                raise SparqlError(
                    f"FILTER bound() on never-bound variable {inner[1]}"
                )
            return F.col(inner[1][1:]).isNull()
        return ~_filter_col(df, inner)
    if kind == "bound":
        if ast[1][1:] not in df.columns:
            raise SparqlError(f"FILTER bound() on never-bound variable {ast[1]}")
        return F.col(ast[1][1:]).isNotNull()
    if kind == "regex":
        return _operand_col(df, ast[1]).rlike(ast[2])
    if kind == "strstarts":
        return _operand_col(df, ast[1]).startswith(ast[2])
    if kind == "strends":
        return _operand_col(df, ast[1]).endswith(ast[2])
    if kind == "contains":
        return _operand_col(df, ast[1]).contains(ast[2])
    if kind == "in":
        col = _operand_col(df, ast[1])
        cond = col.isin(ast[2])
        return cond if ast[3] else ~cond
    if kind == "isblank":
        _require_bound(df, ast[1])
        return F.col(ast[1][1:]).startswith("_:")
    if kind == "isiri":
        _require_meta(df, ast[1], "isIRI()")
        name = ast[1][1:]
        return (~F.col(f"__lit_{name}")) & ~F.col(name).startswith("_:")
    if kind == "isliteral":
        _require_meta(df, ast[1], "isLiteral()")
        return F.col(f"__lit_{ast[1][1:]}")
    if kind == "isnumeric":
        # dialect: a literal whose lexical form casts to a number —
        # the YAML parser types numeric facts (xsd:integer/double) but
        # this engine stores every term as its lexical string, so the
        # castability test IS the numeric-typed test here
        _require_meta(df, ast[1], "isNumeric()")
        name = ast[1][1:]
        return F.col(f"__lit_{name}") & F.col(name).try_cast(
            "double"
        ).isNotNull()
    if kind == "langmatches":
        # language range match over a LANG()-style operand; "*" matches
        # any non-empty tag, otherwise case-insensitive prefix match on
        # subtag boundaries (BCP47 basic filtering)
        tag = F.lower(_operand_col(df, ast[1]).cast("string"))
        rng = ast[2].lower()
        if rng == "*":
            return tag.isNotNull() & (tag != "")
        return (tag == rng) | tag.startswith(rng + "-")
    if kind == "sameterm":
        # lexical-form equality — no numeric coercion, ever — plus the
        # literal-vs-IRI companion flag when both operands carry one
        # (spec: a literal is never sameTerm-equal to an IRI even if
        # their strings match); a var without a companion (subject/
        # predicate position) falls back to lexical equality alone
        _, lhs, rhs = ast
        cond = _str_col(df, lhs) == _str_col(df, rhs)
        flags = []
        for side in (lhs, rhs):
            if side[0] == "var" and f"__lit_{side[1][1:]}" in df.columns:
                flags.append(F.col(f"__lit_{side[1][1:]}"))
            elif side[0] in ("str", "num"):
                flags.append(F.lit(True))
            elif side[0] == "iri":
                flags.append(F.lit(False))
            else:
                flags.append(None)
        if flags[0] is not None and flags[1] is not None:
            cond = cond & (flags[0] == flags[1])
        return cond
    # ("cmp", lhs, op, rhs)
    _, lhs, op, rhs = ast
    a = _operand_col(df, lhs)
    b = _operand_col(df, rhs)
    numeric = (
        _is_numeric_node(lhs)
        or _is_numeric_node(rhs)
        or (op in _ORDERING and lhs[0] == "var" and rhs[0] == "var")
    )
    if numeric:
        a, b = a.try_cast("double"), b.try_cast("double")
    return _CMP[op](a, b)


def _bind_col(df: DataFrame, expr):
    """Compile a BIND expression AST to a Column — the operand
    compiler, except a BARE numeric constant keeps its lexical form
    (terms are strings in this engine; ``BIND(5 AS ?x)`` binds "5",
    not 5.0)."""
    if expr[0] == "num":
        return F.lit(expr[1])
    return _operand_col(df, expr)


def _compile(
    triples: DataFrame,
    items: list,
    graph_var: str | None = None,
    named: DataFrame | None = None,
) -> DataFrame:
    # `named` is the frame GRAPH ranges over — differs from `triples`
    # only under a FROM / FROM NAMED dataset clause (r6c)
    if named is None:
        named = triples
    df = None
    filters = []
    exists_filters = []
    # which variables need term metadata (datatype/literal-ness)
    # companions bound at their first object-position pattern
    meta_remaining: set = set()
    for item in items:
        if item[0] == "filter":
            _collect_meta_vars(item[1], meta_remaining)
    for n, item in enumerate(items):
        kind = item[0]
        if kind == "t":
            frame = _pattern_frame(triples, item[1], n, graph_var, meta_remaining)
            df = frame if df is None else _merge(df, frame)
        elif kind == "path":
            frame = _path_frame(triples, item[1], item[2], item[3], n, graph_var)
            df = frame if df is None else _merge(df, frame)
        elif kind == "graph":
            gterm, g = item[1], item[2]
            if gterm.startswith("?"):
                sub = _compile(named, g, graph_var=gterm[1:], named=named)
            else:
                # constant named graph = a pushdown-friendly filter on
                # the graph column (over the FROM NAMED set when given)
                sub = _compile(named.filter(F.col("doc_iri") == gterm), g,
                               graph_var=graph_var, named=named)
            df = sub if df is None else _merge(df, sub)
        elif kind == "union":
            a = _compile(triples, item[1], graph_var, named)
            b = _compile(triples, item[2], graph_var, named)
            if set(a.columns) != set(b.columns):
                raise SparqlError(
                    f"UNION branches must bind the same variables: "
                    f"{sorted(a.columns)} vs {sorted(b.columns)}"
                )
            u = a.unionByName(b)
            df = u if df is None else _merge(df, u)
        elif kind == "optional":
            o = _compile(triples, item[1], graph_var, named)
            if df is None:
                raise SparqlError("OPTIONAL cannot be the first group member")
            df = _merge(df, o, "left")
        elif kind == "minus":
            m = _compile(triples, item[1], graph_var, named)
            if df is None:
                raise SparqlError("MINUS cannot be the first group member")
            shared = [c for c in m.columns if c in df.columns]
            # SPARQL MINUS: with no shared variables nothing is removed
            if shared:
                df = df.join(m.select(*shared).distinct(), shared, "left_anti")
        elif kind == "values":
            df = _apply_values(
                triples.sparkSession, df, item[1], item[2]
            )
        elif kind == "bind":
            var = item[1]
            if df is None:
                raise SparqlError("BIND cannot be the first group member")
            if var[1:] in df.columns:
                raise SparqlError(f"BIND target {var} is already bound")
            df = df.withColumn(var[1:], _bind_col(df, item[2]))
        elif kind == "subquery":
            # under GRAPH ?var the subquery evaluates PER active graph:
            # its patterns bind the graph column, aggregates implicitly
            # group by it, and the retained column joins with the outer
            # frame's graph binding (r6)
            sub = _select_frame(triples, item[1], graph_var=graph_var, named=named)
            df = sub if df is None else _merge(df, sub)
        elif kind == "filter":
            filters.append(item[1])
        elif kind == "exists":
            exists_filters.append((item[1], item[2]))
    if df is None:
        raise SparqlError("empty graph pattern")
    for g, positive in exists_filters:
        # thread graph_var through: under GRAPH ?g the EXISTS pattern
        # must be scoped to the active graph, so the graph-binding
        # column joins with the outer frame's instead of matching
        # across all named graphs
        sub = _compile(triples, g, graph_var=graph_var, named=named)
        shared = [c for c in sub.columns if c in df.columns]
        if shared:
            # dialect note: bindings join on the shared variables
            # (NULLs from OPTIONAL never match, so NOT EXISTS keeps
            # them); semi/anti joins broadcast when the pattern side
            # is small
            how = "left_semi" if positive else "left_anti"
            df = df.join(sub.select(*shared).distinct(), shared, how)
        else:
            # no shared variables: the pattern's own satisfiability
            # decides for every row (limit(1) short-circuits)
            nonempty = bool(sub.limit(1).count())
            if positive != nonempty:
                df = df.limit(0)
    for ast in filters:
        df = df.filter(_filter_col(df, ast))
    # companion metadata columns are filter-internal — they must never
    # leak into projections, shared-variable joins, or UNION arity
    hidden = [c for c in df.columns if c.startswith("__")]
    if hidden:
        df = df.drop(*hidden)
    return df


_AGG_FNS = {
    "SUM": lambda c: F.sum(c.try_cast("double")),
    "AVG": lambda c: F.avg(c.try_cast("double")),
    "MIN": F.min,
    "MAX": F.max,
}

# DISTINCT variants take the bound COLUMN NAME (SPARQL var names are
# identifier-safe) so SUM/AVG can use the SQL DISTINCT form
_AGG_FNS_DISTINCT = {
    "SUM": lambda n: F.expr(f"sum(DISTINCT try_cast(`{n}` AS double))"),
    "AVG": lambda n: F.expr(f"avg(DISTINCT try_cast(`{n}` AS double))"),
    "MIN": lambda n: F.min(F.col(n)),
    "MAX": lambda n: F.max(F.col(n)),
}


def ask_query(
    triples: DataFrame, sparql_src: str, named: DataFrame | None = None
) -> bool:
    """``ASK { ... }`` — True iff the graph pattern has any solution.
    ``limit(1)`` short-circuits the scan; the boolean necessarily
    reaches the driver (that IS the result)."""
    body, prefixes = _strip_prefixes(sparql_src)
    m = _ASK_RE.match(body)
    if not m:
        raise SparqlError("expected `ASK { ... }`")
    df = _compile(triples, _parse_group(m.group(1), prefixes), named=named)
    return bool(df.limit(1).count())


def construct_query(
    triples: DataFrame, sparql_src: str, named: DataFrame | None = None
) -> DataFrame:
    """``CONSTRUCT { template } WHERE { ... }`` — instantiate each
    template triple once per solution; set semantics (rdflib builds a
    Graph, which dedups). Returns (subj, pred, obj); template terms
    may be constants or variables bound by the WHERE pattern. One
    projection + union per template triple — no extra shuffle beyond
    the final distinct. The §10.2.3 shorthand ``CONSTRUCT WHERE
    { BGP }`` uses the pattern as its own template (plain triples
    only, per spec)."""
    body, prefixes = _strip_prefixes(sparql_src)
    m = _CONSTRUCT_RE.match(body)
    if m:
        tmpl_src, where_src = m.group(1), m.group(2)
        shorthand = False
    else:
        m = _CONSTRUCT_WHERE_RE.match(body)
        if not m:
            raise SparqlError("expected `CONSTRUCT [{ template }] WHERE { ... }`")
        tmpl_src = where_src = m.group(1)
        shorthand = True
    tmpl_items = _parse_group(tmpl_src, prefixes)
    if any(it[0] != "t" for it in tmpl_items):
        raise SparqlError(
            "CONSTRUCT WHERE shorthand requires a plain BGP pattern (§10.2.3)"
            if shorthand
            else "CONSTRUCT templates may contain only plain triples"
        )
    df = _compile(triples, _parse_group(where_src, prefixes), named=named)

    def term_col(t: str):
        if isinstance(t, tuple):
            # typed literal in a template: the output frame carries
            # (subj, pred, obj) only, so emit the lexical form
            return F.lit(t[1])
        if t.startswith("?"):
            if t[1:] not in df.columns:
                raise SparqlError(f"CONSTRUCT template variable never bound: {t}")
            return F.col(t[1:])
        return F.lit(t)

    out = None
    for _, (s, p, o) in tmpl_items:
        one = df.select(
            term_col(s).alias("subj"), term_col(p).alias("pred"), term_col(o).alias("obj")
        )
        out = one if out is None else out.unionByName(one)
    return out.distinct()


def describe_query(
    triples: DataFrame, sparql_src: str, named: DataFrame | None = None
) -> DataFrame:
    """``DESCRIBE <r> ... [WHERE { ... }]`` / ``DESCRIBE ?x WHERE
    { ... }`` — every triple whose subject is one of the described
    resources (constants, plus each DESCRIBE variable's bindings over
    the WHERE solutions). One distinct resource set + one left-semi
    join against the triples table: the big side never shuffles more
    than the semi-join requires, and the resource side is small (it
    broadcasts). Returns (subj, pred, obj, obj_is_literal,
    obj_datatype) rows with set semantics."""
    body, prefixes = _strip_prefixes(sparql_src)
    m = _DESCRIBE_RE.match(body)
    if not m:
        raise SparqlError("expected `DESCRIBE <r>|?var ... [WHERE { ... }]`")
    head_src, where_src = m.group(1), m.group(2)
    head_vars, head_consts = [], []
    for tok in _TOKEN_RE.finditer(head_src):
        k = _kind(tok)
        if k == "var":
            head_vars.append(tok.group("var"))
        elif k in ("iri", "pname"):
            head_consts.append(_term_of(tok, prefixes))
        else:
            raise SparqlError(
                f"DESCRIBE accepts IRIs and variables, got {tok.group(0)!r}"
            )
    if not head_vars and not head_consts:
        raise SparqlError("DESCRIBE needs at least one resource or variable")
    if head_vars and where_src is None:
        raise SparqlError("DESCRIBE ?var needs a WHERE pattern binding it")
    spark = triples.sparkSession
    res = None
    if where_src is not None:
        df = _compile(triples, _parse_group(where_src, prefixes), named=named)
        for v in head_vars:
            if v not in df.columns:
                raise SparqlError(f"DESCRIBE variable never bound: ?{v}")
            one = df.select(F.col(v).alias("r"))
            res = one if res is None else res.unionByName(one)
    if head_consts:
        one = arrow_local_df(spark, [(c,) for c in head_consts], ["r"])
        res = one if res is None else res.unionByName(one)
    res = res.distinct()
    return (
        triples.join(res, triples["subj"] == res["r"], "left_semi")
        .select("subj", "pred", "obj", "obj_is_literal", "obj_datatype")
        .distinct()
    )


def _extract_dataset(sparql_src: str, prefixes: dict):
    """Strip ``FROM <g>`` / ``FROM NAMED <g>`` dataset clauses (SPARQL
    1.1 §13.2) from the query text. The grammar puts dataset clauses
    OUTSIDE every brace pair (between the query form — or a CONSTRUCT
    template — and WHERE), so only brace-depth-0 text is scanned;
    a ``FROM`` inside a pattern's string literal is never misread.
    Returns (cleaned_src, default_iris | None, named_iris | None)."""
    defaults: list = []
    named: list = []
    seen = [False, False]

    def repl(m):
        is_named, iri, pfx, local = m.groups()
        if iri is None:
            if pfx not in prefixes:
                raise SparqlError(f"undeclared prefix: {pfx}")
            iri = prefixes[pfx] + local
        if is_named:
            named.append(iri)
            seen[1] = True
        else:
            defaults.append(iri)
            seen[0] = True
        return " "

    pieces: list = []
    depth = 0
    seg_start = 0
    in_str: str | None = None
    for i, ch in enumerate(sparql_src):
        if in_str is not None:
            if ch == in_str and sparql_src[i - 1] != "\\":
                in_str = None
            continue
        if ch in "\"'":
            in_str = ch
        elif ch == "{":
            if depth == 0:
                pieces.append(_DATASET_RE.sub(repl, sparql_src[seg_start:i]))
                seg_start = i
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                pieces.append(sparql_src[seg_start : i + 1])
                seg_start = i + 1
    tail = sparql_src[seg_start:]
    pieces.append(_DATASET_RE.sub(repl, tail) if depth == 0 else tail)
    if not (seen[0] or seen[1]):
        return sparql_src, None, None
    return "".join(pieces), (defaults if seen[0] else None), (named if seen[1] else None)


def _dataset_frames(triples: DataFrame, defaults, named):
    """(default_frame, named_frame) for a dataset clause: the default
    graph is the union (merge) of the FROM graphs, GRAPH ranges over
    the FROM NAMED set; per §13.2 a clause given WITHOUT its twin
    leaves the twin EMPTY (``FROM NAMED`` only → empty default graph;
    ``FROM`` only → GRAPH matches nothing)."""
    if defaults is None and named is None:
        return triples, triples
    empty = triples.filter(F.lit(False))
    dflt = triples.filter(F.col("doc_iri").isin(defaults)) if defaults else empty
    nmd = triples.filter(F.col("doc_iri").isin(named)) if named else empty
    return dflt, nmd


def make_query(triples: DataFrame, sparql_src: str) -> DataFrame:
    """Evaluate a SPARQL-subset query over the triples table; DISTINCT
    semantics like the reference's set() (core.py:1340). SELECT
    supports BGPs plus FILTER comparisons, UNION, OPTIONAL (left
    join), MINUS, VALUES, BIND, property paths, aggregates with
    GROUP BY, and ORDER BY / LIMIT (compiled to orderBy().limit() —
    Catalyst plans a TakeOrdered, never a full sort). ``ASK`` returns
    a one-row DataFrame with boolean column ``ask``; ``CONSTRUCT``
    returns (subj, pred, obj) rows. ``FROM`` / ``FROM NAMED`` dataset
    clauses (r6c) select the doc_iri graphs visible to plain patterns
    / ``GRAPH`` respectively — pushdown-friendly isin filters."""
    head, prefixes = _strip_prefixes(sparql_src)
    cleaned, defaults, named_iris = _extract_dataset(sparql_src, prefixes)
    if defaults is not None or named_iris is not None:
        triples, named = _dataset_frames(triples, defaults, named_iris)
        sparql_src = cleaned
        head, _ = _strip_prefixes(sparql_src)
    else:
        named = None
    if re.match(r"(ASK|CONSTRUCT|DESCRIBE)\b", head, re.IGNORECASE):
        # these forms have no grouping stage, so a trailing VALUES
        # clause (§18.2.4.3) is equivalent inside the WHERE group —
        # relocate it so the form regexes (anchored on the final
        # brace) match
        sparql_src = _relocate_final_values(sparql_src)
        head, _ = _strip_prefixes(sparql_src)
    if _ASK_RE.match(head):
        spark = triples.sparkSession
        return arrow_local_df(
            spark, [(ask_query(triples, sparql_src, named=named),)], "ask boolean"
        )
    if _CONSTRUCT_RE.match(head) or _CONSTRUCT_WHERE_RE.match(head):
        return construct_query(triples, sparql_src, named=named)
    if _DESCRIBE_RE.match(head):
        return describe_query(triples, sparql_src, named=named)
    return _select_frame(triples, _parse(sparql_src), named=named)


def _select_frame(
    triples: DataFrame,
    parsed,
    graph_var: str | None = None,
    named: DataFrame | None = None,
) -> DataFrame:
    """Compile one parsed SELECT (projection, aggregates, modifiers)
    to a DataFrame — shared by make_query and nested subqueries.
    ``graph_var`` (r6): evaluate as a subquery under ``GRAPH ?g`` —
    patterns bind the graph column, aggregates group by it implicitly,
    and it stays in the output for the per-graph outer join."""
    (select_items, items, group_by, order_by, limit, offset, having,
     final_values) = parsed
    df = _compile(triples, items, graph_var, named)
    if any(it[0] == "star" for it in select_items):
        # SELECT *: every variable the pattern binds, in binding order
        select_items = [("var", c) for c in df.columns]
    plain = [it[1] for it in select_items if it[0] == "var"]
    aggs = [it for it in select_items if it[0] == "agg"]
    exprs = [it for it in select_items if it[0] == "expr"]
    if graph_var is not None and graph_var not in plain:
        select_items = list(select_items) + [("var", graph_var)]
        plain = plain + [graph_var]
        if aggs and graph_var not in group_by:
            # per-graph aggregation: the graph column is an implicit key
            group_by = list(group_by) + [graph_var]
    missing = [v for v in plain + group_by if v not in df.columns]
    if missing:
        raise SparqlError(f"SELECT/GROUP BY variables never bound: {missing}")

    def _apply_exprs(frame: DataFrame) -> DataFrame:
        # (expr AS ?alias) items compute sequentially — a later
        # expression may reference an earlier alias
        for _, ast, alias in exprs:
            if alias in frame.columns:
                raise SparqlError(f"SELECT expression alias ?{alias} already bound")
            frame = frame.withColumn(alias, _operand_col(frame, ast))
        return frame

    def _inline_agg(o_fn, o_dist, o_arg, where):
        # shared builder for hidden aggregate columns (HAVING leaves,
        # ORDER BY inline aggregates) — they ride the query's own
        # groupBy, never an extra shuffle
        if o_fn == "COUNT":
            if o_arg == "*":
                if o_dist:
                    raise SparqlError(
                        f"COUNT(DISTINCT *) is not supported by this "
                        f"dialect ({where}); COUNT(*) or COUNT(DISTINCT ?v)"
                    )
                return F.count(F.lit(1))
            if o_dist:
                return F.countDistinct(F.col(o_arg[1:]))
            return F.count(F.col(o_arg[1:]))
        if o_arg == "*" or o_dist:
            raise SparqlError(f"{where} {o_fn} needs a plain ?variable")
        if o_arg[1:] not in df.columns:
            raise SparqlError(f"{where} aggregate over unbound {o_arg}")
        if o_fn == "SAMPLE":
            # dialect: SAMPLE picks the minimum (deterministic)
            return F.min(F.col(o_arg[1:]))
        return _AGG_FNS[o_fn](F.col(o_arg[1:]))

    # inline-aggregate ORDER BY keys (r6d) resolve to hidden __ord{i}
    # columns computed alongside the query's aggregates
    ord_resolved, ord_hidden, ord_has_agg = [], [], False
    for o_key, o_desc in order_by:
        if isinstance(o_key, tuple):
            _, o_fn, o_dist, o_arg = o_key
            ref = f"__ord{len(ord_hidden)}"
            ord_hidden.append(
                _inline_agg(o_fn, o_dist, o_arg, "ORDER BY").alias(ref)
            )
            ord_resolved.append((ref, o_desc))
            ord_has_agg = True
        else:
            ord_resolved.append((o_key, o_desc))

    if aggs:
        extra = [v for v in plain if v not in group_by]
        if extra:
            raise SparqlError(
                f"non-aggregate SELECT variables must appear in GROUP BY: {extra}"
            )
        cols = []
        for _, fn, dist, arg, alias, sep in aggs:
            if fn == "COUNT":
                if arg == "*":
                    if dist:
                        # counting DISTINCT SOLUTIONS needs null-safe
                        # distinctness over every bound column, which
                        # countDistinct does not give (rows with any
                        # NULL vanish) — raise loudly rather than
                        # silently count the multiset (ADVICE r6)
                        raise SparqlError(
                            "COUNT(DISTINCT *) is not supported by this "
                            "dialect; COUNT(*) or COUNT(DISTINCT ?v)"
                        )
                    col = F.count(F.lit(1))
                elif dist:
                    col = F.countDistinct(F.col(arg[1:]))
                else:
                    col = F.count(F.col(arg[1:]))
            elif fn == "GROUP_CONCAT":
                # dialect (deterministic — SPARQL leaves the order
                # undefined): values concatenate in sorted lexical
                # order; default separator " " per spec
                if arg == "*":
                    raise SparqlError("GROUP_CONCAT(*) is not valid SPARQL")
                if arg[1:] not in df.columns:
                    raise SparqlError(f"aggregate over unbound variable {arg}")
                base = (
                    F.collect_set(F.col(arg[1:]))
                    if dist
                    else F.collect_list(F.col(arg[1:]))
                )
                col = F.array_join(
                    F.array_sort(base), sep if sep is not None else " "
                )
            elif fn == "SAMPLE":
                # dialect (deterministic): SAMPLE picks the minimum
                if arg == "*":
                    raise SparqlError("SAMPLE(*) is not valid SPARQL")
                if arg[1:] not in df.columns:
                    raise SparqlError(f"aggregate over unbound variable {arg}")
                col = F.min(F.col(arg[1:]))
            else:
                if arg == "*":
                    raise SparqlError(f"{fn}(*) is not valid SPARQL")
                if arg[1:] not in df.columns:
                    raise SparqlError(f"aggregate over unbound variable {arg}")
                if dist:
                    # MIN/MAX are duplicate-insensitive; SUM/AVG get
                    # the SQL DISTINCT form over the numeric coercion
                    col = _AGG_FNS_DISTINCT[fn](arg[1:])
                else:
                    col = _AGG_FNS[fn](F.col(arg[1:]))
            cols.append(col.alias(alias))
        cols.extend(ord_hidden)
        having_ref = None
        if having is not None:
            # resolve each comparison leaf to a column reference:
            # inline aggregates become hidden __hav{i} columns in the
            # SAME groupBy (no extra shuffle), aliases reuse the
            # projected aggregate
            n_hidden = [0]

            def _resolve(node):
                if node[0] in ("or", "and"):
                    return (node[0], _resolve(node[1]), _resolve(node[2]))
                if node[0] == "not":
                    return ("not", _resolve(node[1]))
                _, h_fn, h_dist, h_arg, h_alias, h_op, h_const = node
                if h_fn is not None:
                    hcol = _inline_agg(h_fn, h_dist, h_arg, "HAVING")
                    ref = f"__hav{n_hidden[0]}"
                    n_hidden[0] += 1
                    cols.append(hcol.alias(ref))
                else:
                    if h_alias not in [a[4] for a in aggs]:
                        raise SparqlError(
                            f"HAVING alias ?{h_alias} is not a SELECT aggregate"
                        )
                    ref = h_alias
                return ("ref", ref, h_op, h_const)

            having_ref = _resolve(having)
        # SPARQL aggregates run over the solution MULTISET — no distinct
        df = df.groupBy(*group_by).agg(*cols) if group_by else df.agg(*cols)
        if having_ref is not None:

            def _havcol(node):
                if node[0] == "or":
                    return _havcol(node[1]) | _havcol(node[2])
                if node[0] == "and":
                    return _havcol(node[1]) & _havcol(node[2])
                if node[0] == "not":
                    return ~_havcol(node[1])
                _, ref, h_op, h_const = node
                return _CMP[h_op](
                    F.col(ref).try_cast("double"), F.lit(h_const)
                )

            df = df.filter(_havcol(having_ref))
        if final_values is not None:
            # §18.2.4.3: the final VALUES joins the grouped solutions
            # (group keys and aggregate aliases), before projection
            df = _apply_values(
                triples.sparkSession, df, final_values[1], final_values[2]
            )
        # SELECT expressions compute post-aggregation, over the group
        # keys and aggregate aliases; then project in SELECT order
        df = _apply_exprs(df)
        if ord_has_agg:
            # inline-aggregate sort keys live in hidden columns that
            # the projection drops — order first (projection preserves
            # row order), then clear the tail's order step
            df = df.orderBy(
                *[F.col(n).desc() if d else F.col(n).asc()
                  for n, d in ord_resolved]
            )
            order_by = []
        df = df.select(
            *[it[1] if it[0] == "var" else it[4] if it[0] == "agg" else it[2]
              for it in select_items]
        )
    elif having is not None:
        raise SparqlError("HAVING requires aggregates in the SELECT clause")
    elif group_by:
        # GROUP BY with no aggregates = projection to the keys,
        # distinct — unless an inline-aggregate ORDER BY key needs a
        # real groupBy to ride (same single shuffle either way)
        if ord_has_agg:
            df = df.groupBy(*group_by).agg(*ord_hidden)
        else:
            df = df.select(*group_by).distinct()
        if final_values is not None:
            df = _apply_values(
                triples.sparkSession, df, final_values[1], final_values[2]
            )
        df = _apply_exprs(df)
        if ord_has_agg:
            df = df.orderBy(
                *[F.col(n).desc() if d else F.col(n).asc()
                  for n, d in ord_resolved]
            )
            order_by = []
        df = df.select(*[it[1] if it[0] == "var" else it[2] for it in select_items])
    else:
        if final_values is not None:
            df = _apply_values(
                triples.sparkSession, df, final_values[1], final_values[2]
            )
        df = _apply_exprs(df)
        df = df.select(
            *[it[1] if it[0] == "var" else it[2] for it in select_items]
        ).distinct()
    for name, _ in order_by:
        if isinstance(name, tuple):
            # an inline-aggregate sort key outside an aggregating
            # SELECT has nothing to aggregate over
            raise SparqlError(
                "ORDER BY aggregates need aggregates in the SELECT clause"
            )
        if name not in df.columns:
            raise SparqlError(f"ORDER BY references unprojected variable ?{name}")
    if graph_var is not None and (limit is not None or offset is not None):
        # per-graph top-k (r6d): the subquery slices WITHIN each active
        # graph, so LIMIT/OFFSET compile to row_number over a window
        # partitioned by the graph column — one shuffle on the graph
        # key, no per-graph driver loop. ORDER BY is required: an
        # unordered per-graph slice would be nondeterministic.
        if not order_by:
            raise SparqlError(
                "LIMIT/OFFSET in a subquery under GRAPH ?var needs ORDER BY"
            )
        from pyspark.sql.window import Window

        w = Window.partitionBy(graph_var).orderBy(
            *[F.col(n).desc() if d else F.col(n).asc() for n, d in order_by]
        )
        df = df.withColumn("__rn", F.row_number().over(w))
        lo = offset or 0
        cond = F.col("__rn") > lo
        if limit is not None:
            cond = cond & (F.col("__rn") <= lo + limit)
        return df.filter(cond).drop("__rn")
    if order_by:
        df = df.orderBy(
            *[F.col(n).desc() if d else F.col(n).asc() for n, d in order_by]
        )
    if offset is not None:
        # SPARQL: OFFSET skips before LIMIT caps, whatever the clause order
        df = df.offset(offset)
    if limit is not None:
        df = df.limit(limit)
    return df
