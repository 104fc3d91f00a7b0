"""Triple-set assertion helpers for parser tests.

Blank-node groups are resolved back into nested python structures so
tests can assert OWL expressions (restrictions, unions, oneOf lists)
structurally — the standard shortcut for RDF blank-node isomorphism at
fixture size.
"""

from __future__ import annotations

from collections import defaultdict

from yamlpyowl_spark import vocab as V


class TIndex:
    def __init__(self, result, import_map=None):
        self.iri = result.iri
        self.triples = result.triples
        self.by_sp = defaultdict(list)
        self.by_s = defaultdict(list)
        for (s, p, o, lit, dt) in result.triples:
            self.by_sp[(s, p)].append((o, lit, dt))
            self.by_s[s].append((p, o, lit, dt))

    # -- name helpers ---------------------------------------------------

    def e(self, name: str) -> str:
        """entity IRI for a local name"""
        return self.iri + name

    # -- raw access -----------------------------------------------------

    def objs(self, subj_name: str, pred: str):
        """object values (IRIs or lexical literals) of (subj, pred)"""
        return [o for (o, _l, _d) in self.by_sp[(self.e(subj_name), pred)]]

    def lit_objs(self, subj_name: str, pred_name: str):
        return [o for (o, lit, _d) in self.by_sp[(self.e(subj_name), self.e(pred_name))] if lit]

    def facts(self, subj_name: str, pred_name: str):
        """objects of a local-vocabulary predicate, entity names resolved"""
        out = []
        for (o, lit, dt) in self.by_sp[(self.e(subj_name), self.e(pred_name))]:
            if lit:
                out.append((o, dt))
            else:
                out.append(o.replace(self.iri, ""))
        return out

    def has(self, s, p, o, lit=False, dtype=None) -> bool:
        for (oo, ll, dd) in self.by_sp[(s, p)]:
            if oo == o and ll == lit and (dtype is None or dd == dtype):
                return True
        return False

    def has_local(self, subj_name, pred, obj_name) -> bool:
        return self.has(self.e(subj_name), pred, self.e(obj_name))

    def subjects(self):
        return {s for (s, _p, _o, _l, _d) in self.triples}

    def exists(self, subj_name) -> bool:
        return self.e(subj_name) in self.by_s

    def types_of(self, subj_name):
        return self.objs(subj_name, V.RDF_TYPE)

    # -- blank-node structure resolution ---------------------------------

    def rdf_list(self, head):
        out = []
        while head != V.RDF_NIL:
            first = [o for (o, _l, _d) in self.by_sp[(head, V.RDF_FIRST)]]
            rest = [o for (o, _l, _d) in self.by_sp[(head, V.RDF_REST)]]
            assert len(first) == 1 and len(rest) == 1, f"malformed rdf list at {head}"
            out.append(self.resolve(first[0]))
            head = rest[0]
        return out

    def resolve(self, ref, lit=False, dtype=None):
        """Blank ref → nested dict; IRI → shortened name; literal → value."""
        if lit:
            return ("lit", ref, dtype)
        if not ref.startswith("_:"):
            return ref.replace(self.iri, "")
        node = {}
        for (p, o, l, d) in self.by_s[ref]:
            key = p.rsplit("#", 1)[-1]
            if p in (V.OWL_UNION_OF, V.OWL_INTERSECTION_OF, V.OWL_ONE_OF, V.OWL_DISTINCT_MEMBERS):
                node[key] = self.rdf_list(o)
            elif p == V.RDF_TYPE and o in (V.OWL_CLASS, V.OWL_RESTRICTION, V.OWL_ALL_DIFFERENT):
                node.setdefault("_kind", o.rsplit("#", 1)[-1])
            else:
                node[key] = self.resolve(o, l, d)
        return node

    def resolved_objs(self, subj_name, pred):
        return [self.resolve(o, l, d) for (o, l, d) in self.by_sp[(self.e(subj_name), pred)]]


def some(prop, filler):
    return {"_kind": "Restriction", "onProperty": prop, "someValuesFrom": filler}


def value(prop, filler):
    return {"_kind": "Restriction", "onProperty": prop, "hasValue": filler}


def inverse(prop):
    return {"inverseOf": prop}


def union(*args):
    return {"_kind": "Class", "unionOf": list(args)}


def intersection(*args):
    return {"_kind": "Class", "intersectionOf": list(args)}


def one_of(*args):
    return {"_kind": "Class", "oneOf": list(args)}


def lit(v, dt):
    return ("lit", v, dt)
