"""SWRL-rule forward chaining as an iterative DataFrame fixpoint.

The reference applies SWRL rules by shelling out to a Java/Pellet
reasoner (core.py:1342-1343, sync_reasoner_pellet). Here rule bodies
become chains of equi-joins over the triples table and the fixpoint is
a driver loop with ``localCheckpoint`` per round — the classic
(semi-)naive Datalog evaluation mapped onto Spark.

Supported (everything the reference fixtures use):

* class atoms        ``C(?x)``        — with rdfs:subClassOf-closure
                                        semantics (a District is a
                                        GeographicEntity);
* property atoms     ``p(?x, ?y)``    — object or data properties,
                                        constants allowed in any slot;
* builtin atoms      ``greaterThan/lessThan(?v, const)``;
* owl:TransitiveProperty — expanded to ``p(?x,?y), p(?y,?z) → p(?x,?z)``;
* owl:inverseOf      — ``p(?x,?y) → q(?y,?x)`` in both directions.

NOT a DL reasoner: OneOf/Functional/AllDifferent model enumeration
(the zebra puzzle's solution step) is out of scope by design — the
triple-parity contract is on asserted triples (SURVEY.md §2.5).

Rule names are resolved against the document IRI (rules are emitted by
the parser as ``(rule_iri, ypo:ruleSrc, src)`` literals), and chaining
is doc-scoped: all joins carry ``doc_iri``.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame, functions as F

from .. import vocab as V
from ..parser.document import _parse_swrl
from .closure import transitive_closure

_BUILTINS = ("greaterThan", "lessThan")


def _subclass_closed_types(triples: DataFrame) -> DataFrame:
    """(doc_iri, inst, cls) with rdfs:subClassOf closure applied."""
    types = triples.filter(
        (F.col("pred") == V.RDF_TYPE)
        & ~F.col("subj").startswith("_:")
        & ~F.col("obj").startswith("_:")
    ).select("doc_iri", F.col("subj").alias("inst"), F.col("obj").alias("cls"))
    sub = triples.filter(
        (F.col("pred") == V.RDFS_SUBCLASSOF)
        & ~F.col("subj").startswith("_:")
        & ~F.col("obj").startswith("_:")
    ).select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    closure = transitive_closure(sub)
    inherited = (
        types.join(closure, types.cls == closure.src)
        .select("doc_iri", "inst", F.col("dst").alias("cls"))
    )
    return types.unionByName(inherited).distinct()


def _collect_rules(triples: DataFrame) -> List[Tuple[str, list, list]]:
    rows = (
        triples.filter(F.col("pred") == V.YPO_RULE_SRC)
        .select("doc_iri", "obj")
        .distinct()
        .collect()
    )
    out = []
    for r in rows:
        body, head = _parse_swrl(r["obj"])
        out.append((r["doc_iri"], body, head))
    return out


def _property_rules(triples: DataFrame) -> List[Tuple[str, list, list]]:
    """Synthesize rules for TransitiveProperty and inverseOf axioms."""
    out = []
    trans = (
        triples.filter((F.col("pred") == V.RDF_TYPE) & (F.col("obj") == V.OWL_TRANSITIVE))
        .select("doc_iri", "subj")
        .distinct()
        .collect()
    )
    for r in trans:
        name = r["subj"].replace(r["doc_iri"], "")
        out.append(
            (r["doc_iri"], [(name, ["?x", "?y"]), (name, ["?y", "?z"])], [(name, ["?x", "?z"])])
        )
    inv = (
        triples.filter(F.col("pred") == V.OWL_INVERSE_OF)
        .select("doc_iri", "subj", "obj")
        .distinct()
        .collect()
    )
    for r in inv:
        q = r["subj"].replace(r["doc_iri"], "")
        p = r["obj"].replace(r["doc_iri"], "")
        out.append((r["doc_iri"], [(p, ["?x", "?y"])], [(q, ["?y", "?x"])]))
        out.append((r["doc_iri"], [(q, ["?x", "?y"])], [(p, ["?y", "?x"])]))
    return out


def _eval_rule(
    doc_iri: str,
    body: list,
    head: list,
    facts: DataFrame,
    types: DataFrame,
) -> DataFrame:
    """Join the body atoms left-to-right; emit head facts."""
    binding = None

    def merge(b, df):
        if b is None:
            return df
        shared = [c for c in df.columns if c in b.columns]
        return b.join(df, shared) if shared else b.crossJoin(df)

    for pname, args in body:
        if pname in _BUILTINS:
            var, const = args
            col = F.col(var.lstrip("?")).cast("double")
            cmp = col > float(const) if pname == "greaterThan" else col < float(const)
            binding = binding.filter(cmp)
            continue
        if len(args) == 1:
            t = types.filter((F.col("doc_iri") == doc_iri) & (F.col("cls") == doc_iri + pname))
            a = args[0]
            if a.startswith("?"):
                t = t.select(F.col("inst").alias(a[1:]))
            else:
                t = t.filter(F.col("inst") == doc_iri + a).select(F.lit(1).alias("_one"))
            binding = merge(binding, t.distinct())
        else:
            t = facts.filter((F.col("doc_iri") == doc_iri) & (F.col("pred") == doc_iri + pname))
            s, o = args
            cols = []
            if s.startswith("?"):
                cols.append(F.col("subj").alias(s[1:]))
            else:
                t = t.filter(F.col("subj") == doc_iri + s)
            if o.startswith("?"):
                cols.append(F.col("obj").alias(o[1:]))
            else:
                # constant object: literal lexical form or a local name
                t = t.filter(
                    F.when(F.col("obj_is_literal"), F.col("obj") == o).otherwise(
                        F.col("obj") == doc_iri + o
                    )
                )
            t = t.select(*cols) if cols else t.select(F.lit(1).alias("_one"))
            binding = merge(binding, t.distinct())

    if binding is None:
        return None

    out = None
    for pname, args in head:
        s, o = args
        subj = F.col(s[1:]) if s.startswith("?") else F.lit(doc_iri + s)
        if o.startswith("?"):
            obj = F.col(o[1:])
            is_lit = F.lit(False)
            dtype = F.lit(None).cast("string")
        else:
            try:
                val = int(o)
                obj, is_lit, dtype = F.lit(str(val)), F.lit(True), F.lit(V.XSD_INTEGER)
            except ValueError:
                try:
                    val = float(o)
                    obj, is_lit, dtype = F.lit(str(val)), F.lit(True), F.lit(V.XSD_DOUBLE)
                except ValueError:
                    obj, is_lit, dtype = F.lit(doc_iri + o), F.lit(False), F.lit(None).cast("string")
        h = binding.select(
            subj.alias("subj"),
            F.lit(doc_iri + pname).alias("pred"),
            obj.alias("obj"),
            is_lit.alias("obj_is_literal"),
            dtype.alias("obj_datatype"),
            F.lit(doc_iri).alias("doc_iri"),
        ).distinct()
        out = h if out is None else out.unionByName(h)
    return out


def forward_chain(triples: DataFrame, max_iter: int = 15) -> DataFrame:
    """Returns the INFERRED facts (subj, pred, obj, obj_is_literal,
    obj_datatype, doc_iri) — the delta the Pellet step would add for
    the supported fragment. Fixpoint: rounds of rule application until
    no new facts; lineage cut per round."""
    spark = triples.sparkSession

    fact_cols = ["subj", "pred", "obj", "obj_is_literal", "obj_datatype", "doc_iri"]
    base = (
        triples.filter(
            (F.col("pred") != V.RDF_TYPE) & ~F.col("subj").startswith("_:") & ~F.col("obj").startswith("_:")
        )
        .select(*fact_cols)
        .distinct()
    )
    types = _subclass_closed_types(triples).localCheckpoint()

    rules = _collect_rules(triples) + _property_rules(triples)
    if not rules:
        return spark.createDataFrame([], base.schema)

    facts = base.localCheckpoint()
    n_facts = facts.count()

    for _ in range(max_iter):
        new = None
        for doc_iri, body, head in rules:
            h = _eval_rule(doc_iri, body, head, facts, types)
            if h is not None:
                new = h if new is None else new.unionByName(h)
        if new is None:
            break
        facts = facts.unionByName(new).distinct().localCheckpoint()
        n2 = facts.count()
        if n2 == n_facts:
            break
        n_facts = n2

    # null-safe anti-join: obj_datatype is NULL for non-literals and a
    # plain equi-join would never match NULLs, leaking base facts into
    # the "inferred" delta
    cond = None
    b = base.alias("b")
    f = facts.alias("f")
    for c in fact_cols:
        eq = F.col(f"f.{c}").eqNullSafe(F.col(f"b.{c}"))
        cond = eq if cond is None else cond & eq
    return f.join(b, cond, "left_anti").select(*fact_cols)
