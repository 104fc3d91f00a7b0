"""Property-based invariants for the OWL-RL per-document rule engine
(operators/owlrl): seeded random triple soups over a small OWL
vocabulary → structural guarantees the hand-written rule tests cannot
sweep combinatorially.

Invariants:
* the outer fixpoint CONVERGES (one more pass adds nothing),
* it is IDEMPOTENT (re-running on base ∪ inferred adds nothing),
* it is MONOTONE-SAFE on diagnostics (a second application never
  amplifies ypo: rows — the eq-rep replication bug class),
* inferred triples never duplicate asserted ones,
* every inferred subject/predicate is non-blank (the engine's output
  contract for entity-level facts).
"""

from hypothesis import given, settings, strategies as st

from yamlpyowl_spark import vocab as V
from yamlpyowl_spark.operators.owlrl import _infer_doc, infer_doc_fixpoint

settings.register_profile("kg_owlrl", max_examples=60, deadline=None)
settings.load_profile("kg_owlrl")

OWL = "http://www.w3.org/2002/07/owl#"
E = "http://ex.org/"

_INDS = [E + n for n in ("a", "b", "c", "d")]
_PROPS = [E + p for p in ("p", "q")]
_CLASSES = [E + c for c in ("C", "D", "X")]


@st.composite
def triple_soups(draw):
    rows = []
    # property characteristics (any combination, incl. pathological)
    for p in _PROPS:
        for char in (
            V.OWL_FUNCTIONAL,
            V.OWL_INVERSE_FUNCTIONAL,
            V.OWL_TRANSITIVE,
            V.OWL_SYMMETRIC,
            OWL + "IrreflexiveProperty",
            OWL + "AsymmetricProperty",
        ):
            if draw(st.booleans()):
                rows.append((p, V.RDF_TYPE, char, False))
    if draw(st.booleans()):
        rows.append((_PROPS[0], V.OWL_INVERSE_OF, _PROPS[1], False))
    if draw(st.booleans()):
        rows.append((_PROPS[0], V.RDFS_SUBPROPERTYOF, _PROPS[1], False))
    # schema: subclass / equivalence / disjoint / complement
    for s, o in draw(
        st.lists(
            st.tuples(st.sampled_from(_CLASSES), st.sampled_from(_CLASSES)),
            max_size=3,
        )
    ):
        pred = draw(
            st.sampled_from(
                [
                    V.RDFS_SUBCLASSOF,
                    V.OWL_EQUIVALENT_CLASS,
                    OWL + "disjointWith",
                    OWL + "complementOf",
                ]
            )
        )
        rows.append((s, pred, o, False))
    # one restriction definition wired to a random class
    if draw(st.booleans()):
        cls = draw(st.sampled_from(_CLASSES))
        how = draw(st.sampled_from([V.RDFS_SUBCLASSOF, V.OWL_EQUIVALENT_CLASS]))
        rows.append((cls, how, "_:r0", False))
        rows.append(("_:r0", V.OWL_ON_PROPERTY, draw(st.sampled_from(_PROPS)), False))
        kind = draw(st.sampled_from(["hv", "svf", "avf", "max0", "max1"]))
        if kind == "hv":
            rows.append(("_:r0", V.OWL_HAS_VALUE, draw(st.sampled_from(_INDS)), False))
        elif kind == "svf":
            rows.append(
                ("_:r0", V.OWL_SOME_VALUES_FROM, draw(st.sampled_from(_CLASSES)), False)
            )
        elif kind == "avf":
            rows.append(
                ("_:r0", OWL + "allValuesFrom", draw(st.sampled_from(_CLASSES)), False)
            )
        else:
            rows.append(
                ("_:r0", OWL + "maxCardinality", "0" if kind == "max0" else "1", True)
            )
    # facts, types, identity assertions
    for _ in range(draw(st.integers(0, 6))):
        s = draw(st.sampled_from(_INDS))
        which = draw(st.integers(0, 3))
        if which == 0:
            rows.append((s, draw(st.sampled_from(_PROPS)), draw(st.sampled_from(_INDS)), False))
        elif which == 1:
            rows.append((s, V.RDF_TYPE, draw(st.sampled_from(_CLASSES + [V.OWL_NOTHING])), False))
        elif which == 2:
            rows.append((s, OWL + "sameAs", draw(st.sampled_from(_INDS)), False))
        else:
            rows.append((s, OWL + "differentFrom", draw(st.sampled_from(_INDS)), False))
    return rows


@given(triple_soups())
def test_fixpoint_converges_and_is_idempotent(rows):
    base = set(rows)
    acc = infer_doc_fixpoint(rows)
    # converged: one more raw pass over base ∪ acc adds nothing new
    again = _infer_doc(sorted(base | acc)) - acc - base
    assert not again, f"fixpoint did not converge: {sorted(again)[:5]}"
    # idempotent at the wrapper level too
    assert infer_doc_fixpoint(sorted(base | acc)) - acc - base == set()


@given(triple_soups())
def test_inferred_disjoint_from_asserted_and_wellformed(rows):
    base = set(rows)
    acc = infer_doc_fixpoint(rows)
    assert not (acc & base)
    for s, p, o, il in acc:
        assert not s.startswith("_:") and not p.startswith("_:")


@given(triple_soups())
def test_diagnostics_stable_under_reapplication(rows):
    base = set(rows)
    acc = infer_doc_fixpoint(rows)
    diag1 = {t for t in acc if t[1].startswith(V.YPO)}
    acc2 = infer_doc_fixpoint(sorted(base | acc)) | acc
    diag2 = {t for t in acc2 if t[1].startswith(V.YPO)}
    assert diag1 == diag2
