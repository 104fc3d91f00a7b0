"""Property-based parser tests: seeded random ontology documents →
structural invariants. Complements the fixture-mirror tests with
coverage of construct combinations the fixtures don't exercise."""

import yaml
from hypothesis import given, settings, strategies as st

from yamlpyowl_spark import vocab as V
from yamlpyowl_spark.parser import parse_document

settings.register_profile("kg", max_examples=40, deadline=None)
settings.load_profile("kg")

_NAME = st.from_regex(r"[A-Z][a-zA-Z0-9]{1,10}", fullmatch=True)
_LIT = st.one_of(
    st.integers(-1000, 1000),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(alphabet="abc xyz.§ü\n", min_size=0, max_size=30),
)


@st.composite
def ontology_documents(draw):
    """Generate a *valid* document: names declared before use, correct
    kinds in every slot."""
    doc = [{"iri": f"https://example.org/gen{draw(st.integers(0, 99))}#"}]
    classes = []
    for i in range(draw(st.integers(1, 6))):
        name = f"C{i}_{draw(_NAME)}"
        parent = draw(st.sampled_from(classes)) if classes and draw(st.booleans()) else "owl:Thing"
        doc.append({"owl_class": {name: {"SubClassOf": parent}}})
        classes.append(name)

    obj_props, data_props = [], []
    for i in range(draw(st.integers(0, 3))):
        name = f"op{i}"
        chars = draw(st.lists(st.sampled_from(["Functional", "Transitive", "Symmetric"]), unique=True, max_size=2))
        inner = {"Domain": draw(st.sampled_from(classes)), "Range": draw(st.sampled_from(classes))}
        if chars:
            inner["Characteristics"] = chars
        doc.append({"owl_object_property": {name: inner}})
        obj_props.append((name, "Functional" in chars))
    for i in range(draw(st.integers(0, 2))):
        name = f"dp{i}"
        doc.append(
            {"owl_data_property": {name: {"Domain": draw(st.sampled_from(classes)), "Range": draw(st.sampled_from(["int", "float", "str"]))}}}
        )
        data_props.append(name)

    individuals = []
    for i in range(draw(st.integers(1, 6))):
        name = f"ind{i}"
        doc.append({"owl_individual": {name: {"types": [draw(st.sampled_from(classes))]}}})
        individuals.append(name)

    facts = {}
    for name, functional in obj_props:
        if draw(st.booleans()):
            subj = draw(st.sampled_from(individuals))
            if functional:
                facts[name] = {"Facts": [{subj: draw(st.sampled_from(individuals))}]}
            else:
                facts[name] = {
                    "Facts": [{subj: draw(st.lists(st.sampled_from(individuals), min_size=1, max_size=3))}]
                }
    for name in data_props:
        if draw(st.booleans()):
            facts[name] = {"Facts": [{draw(st.sampled_from(individuals)): draw(_LIT)}]}
    if facts:
        doc.append({"property_facts": facts})

    if obj_props and draw(st.booleans()):
        doc.append(
            {
                "restriction": {
                    "Subject": draw(st.sampled_from(classes + individuals)),
                    "Body": {obj_props[0][0]: {draw(st.sampled_from(["some", "value"])): draw(st.sampled_from(classes if draw(st.booleans()) else individuals))}},
                }
            }
        )
    if draw(st.booleans()):
        doc.append({"different_individuals": ["__all__"]})
    return yaml.safe_dump(doc, allow_unicode=True, sort_keys=False)


@given(ontology_documents())
def test_parse_succeeds_and_is_deterministic(content):
    r1 = parse_document(content)
    r2 = parse_document(content)
    assert r1.triples == r2.triples
    assert len(r1.triples) >= 1


@given(ontology_documents())
def test_subjects_are_known_entities_or_blanks(content):
    r = parse_document(content)
    iri = r.iri
    declared = {s for (s, p, o, _l, _d) in r.triples if p == V.RDF_TYPE}
    for (s, _p, _o, _l, _d) in r.triples:
        assert (
            s == iri or s.startswith("_:") or s in declared or s.startswith(iri)
        ), s


@given(ontology_documents())
def test_blank_nodes_are_doc_scoped_and_referenced(content):
    r = parse_document(content)
    blanks_as_subj = {s for (s, *_rest) in r.triples if s.startswith("_:")}
    blanks_as_obj = {o for (_s, _p, o, lit, _d) in r.triples if not lit and o.startswith("_:")}
    # every blank used as an object has its own triple group
    assert blanks_as_obj <= blanks_as_subj
    import hashlib

    sha16 = hashlib.sha256(content.encode()).hexdigest()[:16]
    assert all(b.startswith(f"_:{sha16}_") for b in blanks_as_subj)


@given(ontology_documents())
def test_literals_have_datatypes(content):
    r = parse_document(content)
    for (_s, _p, _o, lit, dt) in r.triples:
        if lit:
            assert dt in (V.XSD_INTEGER, V.XSD_DOUBLE, V.XSD_STRING, V.XSD_BOOLEAN)
        else:
            assert dt is None
