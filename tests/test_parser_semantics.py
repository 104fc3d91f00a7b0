"""Parser-semantics tests mirroring the reference's own pre-reasoner
assertions (reference tests/test_core.py, cited per test) as triple
assertions. This is the triple-parity (P/R) evidence: every observable
the reference test suite checks before calling the reasoner is checked
here against our emitted triple set.
"""

import pytest

from yamlpyowl_spark import vocab as V
from yamlpyowl_spark.parser import ParseError, UnknownEntityError, parse_document
from yamlpyowl_spark.sources.fixtures import (
    DEMO_ONTOLOGY,
    build_default_import_map,
    load_fixture_texts,
    reference_available,
)

from kg_assert import TIndex, inverse, lit, one_of, some, union, value

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference fixtures not mounted"
)


@pytest.fixture(scope="module")
def fixtures():
    texts = load_fixture_texts()
    imap = build_default_import_map()
    return {path: TIndex(parse_document(text, import_map=imap)) for path, text in texts.items()}


@pytest.fixture(scope="module")
def pizza(fixtures):
    return fixtures["examples/pizza.owl.yml"]


@pytest.fixture(scope="module")
def regional(fixtures):
    return fixtures["examples/regional-rules.owl.yml"]


@pytest.fixture(scope="module")
def zebra(fixtures):
    return fixtures["examples/einsteins_zebra_riddle.owl.yml"]


@pytest.fixture(scope="module")
def basic(fixtures):
    return fixtures["tests/test_ontologies/basic_feature_ontology.owl.yml"]


# ---------------------------------------------------------------------------
# pizza — mirrors reference tests/test_core.py:22-53
# ---------------------------------------------------------------------------


class TestPizza:
    def test_iri(self, pizza):
        # test_core.py:33
        assert pizza.iri == "https://w3id.org/yet/undefined/simplified-pizza-ontology#"
        assert pizza.has(pizza.iri, V.RDF_TYPE, V.OWL_ONTOLOGY)

    def test_data_property_facts(self, pizza):
        # test_core.py:25-26 — mypizza1.hasNumericalValues == [10],
        # mypizza2.hasNumericalValues == [12.5, -3]
        assert pizza.facts("mypizza1", "hasNumericalValues") == [("10", V.XSD_INTEGER)]
        assert pizza.facts("mypizza2", "hasNumericalValues") == [
            ("12.5", V.XSD_DOUBLE),
            ("-3", V.XSD_INTEGER),
        ]

    def test_functional_object_fact(self, pizza):
        # test_core.py:27 — mypizza1.hasBase == iThinAndCrispyBase
        assert pizza.facts("mypizza1", "hasBase") == ["iThinAndCrispyBase"]

    def test_multiline_strings(self, pizza):
        # test_core.py:28-31 — multiline yaml strings preserved verbatim
        assert [v for (v, _d) in pizza.facts("mypizza2", "hasStrAttribute")] == [
            "Tasty",
            "Pizza!",
            "Multi line\nstring\n\nattribute\n",
            "Second multi line string attribute\n",
        ]

    def test_relation_concept_facts_order(self, pizza):
        # test_core.py:35 — X_hasCombinedTasteValue_RC[1].hasFunctionValue == 0.5
        rcs = pizza.facts("iMozzarellaTopping", "X_hasCombinedTasteValue_RC")
        assert rcs == ["iX_CombinedTasteValue_RC_0", "iX_CombinedTasteValue_RC_1"]
        assert pizza.facts("iX_CombinedTasteValue_RC_1", "hasFunctionValue") == [
            ("0.5", V.XSD_DOUBLE)
        ]
        assert pizza.facts("iX_CombinedTasteValue_RC_0", "hasFunctionValue") == [
            ("0.95", V.XSD_DOUBLE)
        ]
        assert pizza.facts("iX_CombinedTasteValue_RC_0", "hasCombinationPartner") == [
            "iTomatoTopping"
        ]

    def test_rc_magic_roles(self, pizza):
        # core.py:659-719 — auto-created generic_RC_main_role + X_has..._RC
        g = pizza.e("generic_RC_main_role")
        assert pizza.has(g, V.RDF_TYPE, V.OWL_OBJECT_PROPERTY)
        assert pizza.has(g, V.RDFS_DOMAIN, V.OWL_THING)
        assert pizza.has(g, V.RDFS_RANGE, V.OWL_THING)
        r = pizza.e("X_hasCombinedTasteValue_RC")
        assert pizza.has(r, V.RDF_TYPE, V.OWL_OBJECT_PROPERTY)
        assert pizza.has(r, V.RDFS_DOMAIN, pizza.e("PizzaTopping"))
        assert pizza.has(r, V.RDFS_RANGE, pizza.e("X_CombinedTasteValue_RC"))
        assert pizza.has(r, V.RDFS_SUBPROPERTYOF, g)

    def test_individual_existence(self, pizza):
        # test_core.py:50-53 — iTomatoTopping declared, iOnionTopping not
        assert pizza.has_local("iTomatoTopping", V.RDF_TYPE, "TomatoTopping")
        assert not pizza.exists("iOnionTopping")

    def test_class_hierarchy(self, pizza):
        assert pizza.has_local("MozzarellaTopping", V.RDFS_SUBCLASSOF, "CheezeTopping")
        assert pizza.has(pizza.e("DomainThing"), V.RDFS_SUBCLASSOF, V.OWL_THING)

    def test_inverse_property(self, pizza):
        # isIngredientOf: Inverse: hasIngredient — domain/range swapped from
        # hasIngredient (Food/Food), declared Domain/Range ignored (core.py:861-862)
        p = pizza.e("isIngredientOf")
        assert pizza.has(p, V.OWL_INVERSE_OF, pizza.e("hasIngredient"))
        assert pizza.has(p, V.RDFS_DOMAIN, pizza.e("Food"))
        # hasIngredient is Transitive but NOT Functional/InverseFunctional →
        # the inverse gets no characteristics at all (core.py:874-878)
        assert not pizza.has(p, V.RDF_TYPE, V.OWL_TRANSITIVE)
        assert not pizza.has(p, V.RDF_TYPE, V.OWL_FUNCTIONAL)

    def test_annotations(self, pizza):
        comments = [o for o in pizza.by_sp[(pizza.iri, V.RDFS_COMMENT)]]
        assert len(comments) == 2


# ---------------------------------------------------------------------------
# regional-rules — mirrors reference tests/test_core.py:55-144 (pre-reasoner)
# ---------------------------------------------------------------------------


class TestRegionalRules:
    def test_has_part_facts(self, regional):
        # test_core.py:59-60
        assert "leipzig" in regional.facts("saxony", "hasPart")
        assert regional.has_local("dresden", V.RDF_TYPE, "District")

    def test_multiple_inheritance(self, regional):
        # test_core.py:67-69
        assert regional.has_local("TrainStation", V.RDFS_SUBCLASSOF, "Facility")
        assert regional.has_local("TrainStation", V.RDFS_SUBCLASSOF, "LocationType")
        assert not regional.has_local("TrainStation", V.RDFS_SUBCLASSOF, "FederalState")

    def test_rc_document_references(self, regional):
        # test_core.py:72-74
        assert regional.facts("dir_rule1", "X_hasDocumentReference_RC") == [
            "iX_DocumentReference_RC_0"
        ]
        assert regional.facts("iX_DocumentReference_RC_0", "hasSection") == [
            ("§ 1.1", V.XSD_STRING)
        ]
        assert regional.facts("iX_DocumentReference_RC_1", "hasSourceDocument") == [
            "law_book_of_saxony"
        ]
        assert regional.facts("iX_DocumentReference_RC_1", "hasSection") == [
            ("§ 1.5", V.XSD_STRING)
        ]

    def test_rc_order_preserved(self, regional):
        # test_core.py:76-79, 114-117 — munich's 4 IRR RCs in document order
        rcs = regional.facts("munich", "X_hasInterRegionRelation_RC")
        assert rcs == [f"iX_InterRegionRelation_RC_{i}" for i in range(4)]
        targets = [regional.facts(rc, "hasIRRTarget")[0] for rc in rcs]
        assert targets == ["dresden", "passau", "regensburg", "leipzig"]
        assert regional.facts(rcs[0], "hasIRRValue") == [("0.5", V.XSD_DOUBLE)]
        assert regional.facts(rcs[2], "hasIRRValue") == [("0.7", V.XSD_DOUBLE)]

    def test_or_domain(self, regional):
        # test_core.py:81-82 — X_hasTesting_RC.domain == [Directive | Facility]
        domains = regional.resolved_objs("X_hasTesting_RC", V.RDFS_DOMAIN)
        assert domains == [union("Directive", "Facility")]

    def test_directive_facts_pre_reasoner(self, regional):
        # test_core.py:84-88 — only explicitly asserted facts exist
        assert regional.facts("dresden", "hasDirective") == []
        assert regional.facts("germany", "hasDirective") == ["dir_rule0"]
        assert regional.facts("saxony", "hasDirective") == []
        assert regional.facts("leipzig", "hasDirective") == []
        assert sorted(regional.facts("munich", "hasDirective")) == ["dir_rule2", "dir_rule3"]

    def test_swrl_rules_preserved(self, regional):
        # core.py:1170-1195 — 4 rules stored with source
        for name in ("top_down", "applicable_doc", "affected_regions", "debug"):
            assert regional.has(regional.e(name), V.RDF_TYPE, V.SWRL_IMP)
        srcs = regional.facts("top_down", "")  # not a real predicate
        src = regional.by_sp[(regional.e("top_down"), V.YPO_RULE_SRC)]
        assert len(src) == 1 and "hasDirective(?p, ?r)" in src[0][0]

    def test_inverse_ignores_declared_characteristics(self, regional):
        # isPartOf declares Transitive, but the reference ignores declared
        # Characteristics for owl_inverse_property (core.py:874-878):
        # characteristics come only from swapping Functional/InverseFunctional
        p = regional.e("isPartOf")
        assert regional.has(p, V.OWL_INVERSE_OF, regional.e("hasPart"))
        assert not regional.has(p, V.RDF_TYPE, V.OWL_TRANSITIVE)

    def test_bgp_query_oracle(self, regional):
        # test_core.py:124-131 — ?x hasSection "§ 1.1" → iX_DocumentReference_RC_0
        hits = [
            s
            for (s, p, o, l, d) in regional.triples
            if p == regional.e("hasSection") and o == "§ 1.1"
        ]
        assert hits == [regional.e("iX_DocumentReference_RC_0")]
        # test_core.py:133-140 — ?x hasPart dresden → saxony
        hits = [
            s
            for (s, p, o, l, d) in regional.triples
            if p == regional.e("hasPart") and o == regional.e("dresden")
        ]
        assert hits == [regional.e("saxony")]


# ---------------------------------------------------------------------------
# zebra — mirrors reference tests/test_core.py:171-263 (pre-reasoner)
# ---------------------------------------------------------------------------


class TestZebra:
    def test_iri(self, zebra):
        # test_core.py:175
        assert zebra.iri == "https://w3id.org/yet/undefined/einstein-zebra-puzzle-ontology#"

    def test_dog_not_pet_before_reasoning(self, zebra):
        # test_core.py:179 — dog is owl:Thing, Pet only via OneOf-equivalence
        assert V.OWL_THING in zebra.types_of("dog")
        assert zebra.e("Pet") not in zebra.types_of("dog")

    def test_house_chain_facts(self, zebra):
        # test_core.py:180-182
        assert zebra.facts("house_2", "right_to") == ["house_1"]
        assert zebra.objs("house_1", zebra.e("right_to")) == [V.OWL_NOTHING]
        assert zebra.objs("house_5", zebra.e("left_to")) == [V.OWL_NOTHING]

    def test_functional_characteristics(self, zebra):
        # test_core.py:183-184 — right_to/left_to functional;
        # left_to inherits swapped Functional+InverseFunctional (both, since
        # right_to declares both)
        for prop in ("right_to", "left_to"):
            assert zebra.has(zebra.e(prop), V.RDF_TYPE, V.OWL_FUNCTIONAL)
            assert zebra.has(zebra.e(prop), V.RDF_TYPE, V.OWL_INVERSE_FUNCTIONAL)
        assert zebra.has(zebra.e("left_to"), V.OWL_INVERSE_OF, zebra.e("right_to"))

    def test_oneof_equivalences(self, zebra):
        # Pet ≡ OneOf(dog zebra snails fox horse) — doc order
        eq = zebra.resolved_objs("Pet", V.OWL_EQUIVALENT_CLASS)
        assert eq == [one_of("dog", "zebra", "snails", "fox", "horse")]
        eq = zebra.resolved_objs("Man", V.OWL_EQUIVALENT_CLASS)
        assert eq == [one_of("Englishman", "Japanese", "Norwegian", "Spaniard", "Ukrainian")]

    def test_simple_facts(self, zebra):
        # test_core.py:210, 227, 251
        assert zebra.facts("Ukrainian", "drinks") == ["tea"]
        assert zebra.facts("Norwegian", "lives_in") == ["house_1"]
        assert zebra.facts("Japanese", "smokes") == ["Parliaments"]

    def test_class_restriction(self, zebra):
        # Man ⊑ owns.some(Pet), drinks.some(Beverage), lives_in.some(House)
        parents = zebra.resolved_objs("Man", V.RDFS_SUBCLASSOF)
        assert some("owns", "Pet") in parents
        assert some("drinks", "Beverage") in parents
        assert some("lives_in", "House") in parents

    def test_individual_restrictions(self, zebra):
        # test_core.py:199 — Englishman: lives_in.some(has_color.value(red))
        types = zebra.resolved_objs("Englishman", V.RDF_TYPE)
        assert some("lives_in", value("has_color", "red")) in types
        # test_core.py:202 — Spaniard: owns.value(dog)
        assert value("owns", "dog") in zebra.resolved_objs("Spaniard", V.RDF_TYPE)

    def test_inverse_restrictions(self, zebra):
        # test_core.py:205 — coffee: Inverse(drinks).some(lives_in.some(has_color.value(green)))
        types = zebra.resolved_objs("coffee", V.RDF_TYPE)
        expected = {
            "_kind": "Restriction",
            "onProperty": inverse("drinks"),
            "someValuesFrom": some("lives_in", value("has_color", "green")),
        }
        assert expected in types

    def test_deep_inverse_chain(self, zebra):
        # test_core.py:231-234 — Chesterfields rule 11 (nested Inverse)
        types = zebra.resolved_objs("Chesterfields", V.RDF_TYPE)
        expected = {
            "_kind": "Restriction",
            "onProperty": inverse("smokes"),
            "someValuesFrom": some(
                "lives_in",
                some(
                    "right_to",
                    {
                        "_kind": "Restriction",
                        "onProperty": inverse("lives_in"),
                        "someValuesFrom": value("owns", "fox"),
                    },
                ),
            ),
        }
        assert expected in types

    def test_different_individuals_all(self, zebra):
        # zebra declares 30 individuals then different_individuals: [__all__]
        groups = [
            zebra.resolve(s)
            for s in zebra.subjects()
            if s.startswith("_:") and zebra.has(s, V.RDF_TYPE, V.OWL_ALL_DIFFERENT)
        ]
        assert len(groups) == 1
        members = groups[0]["distinctMembers"]
        assert len(members) == 30
        assert members[0] == "dog" and "zebra" in members and "house_3" in members


# ---------------------------------------------------------------------------
# basic features — mirrors reference tests/test_core.py:267-384 (pre-reasoner)
# ---------------------------------------------------------------------------


class TestBasicFeatures:
    def test_iri_and_global_annotations(self, basic):
        # test_core.py:278-283
        assert basic.iri == "https://w3id.org/unpublished/yamlpyowl/basic-feature-ontology#"
        comments = basic.by_sp[(basic.iri, V.RDFS_COMMENT)]
        assert len(comments) == 2
        assert all("utc_global_annotation" in c[0] for c in comments)

    def test_class_annotations(self, basic):
        # test_core.py:286-288
        c1 = basic.by_sp[(basic.e("Class1"), V.RDFS_COMMENT)]
        assert len(c1) == 1 and "utc_annotation" in c1[0][0]
        assert len(basic.by_sp[(basic.e("Class2"), V.RDFS_COMMENT)]) == 4

    def test_labels(self, basic):
        # test_core.py:291-293
        labels = basic.by_sp[(basic.e("Class4"), V.RDFS_LABEL)]
        assert len(labels) == 3
        assert labels[0][0] == "First label"
        assert "\n" in labels[-1][0][:-1]

    def test_import(self, basic):
        # test_core.py:296-305
        bfo_iri = "http://purl.obolibrary.org/obo/bfo.owl#"
        assert basic.has(basic.iri, V.OWL_IMPORTS, bfo_iri)
        comments = basic.by_sp[(bfo_iri, V.RDFS_COMMENT)]
        assert len(comments) == 1
        import json

        iad = json.loads(comments[0][0])
        assert "download_link" in iad["import_annotations"]
        assert iad["import_annotations"]["comment"] == "utc_import_annotation_comment"

    def test_ns_resolved_superclass(self, basic):
        # test_core.py:312-313 — Class3 ⊑ bfo:BFO_0000001 (note: real BFO
        # class IRIs have no `bfo.owl#` prefix)
        assert basic.has(
            basic.e("Class3"), V.RDFS_SUBCLASSOF, "http://purl.obolibrary.org/obo/BFO_0000001"
        )

    def test_proxy_individuals(self, basic):
        # test_core.py:315-327 — recursive proxy individuals
        for name, cls in [
            ("iClass5", "Class5"),
            ("iClass5a", "Class5a"),
            ("iClass5b", "Class5b"),
            ("iClass5b1", "Class5b1"),
        ]:
            assert basic.has_local(name, V.RDF_TYPE, cls), name
        # __create_proxy_individual: False stops the recursion
        assert not basic.exists("iClass5a1")
        assert not basic.exists("iClass5a2")

    def test_equivalent_to_variants(self, basic):
        # test_core.py:329-346
        assert basic.resolved_objs("Class6", V.OWL_EQUIVALENT_CLASS) == ["Class2"]
        assert basic.resolved_objs("Class2", V.OWL_EQUIVALENT_CLASS) == []
        assert basic.resolved_objs("Class7", V.OWL_EQUIVALENT_CLASS) == [
            union("Class2", "Class3")
        ]
        v801 = value("has_demo_function_value", lit("801", V.XSD_INTEGER))
        v802 = value("has_demo_function_value", lit("802", V.XSD_INTEGER))
        assert basic.resolved_objs("Class8a", V.OWL_EQUIVALENT_CLASS) == [union(v801, v802)]
        assert basic.resolved_objs("Class8c", V.OWL_EQUIVALENT_CLASS) == [v802]
        # Class8d: a LIST body = two separate equivalence axioms
        assert len(basic.resolved_objs("Class8d", V.OWL_EQUIVALENT_CLASS)) == 2

    def test_complex_subclass(self, basic):
        # test_core.py:348-352 — Class9a: owl:Thing + one expression parent
        parents = basic.resolved_objs("Class9a", V.RDFS_SUBCLASSOF)
        assert len(parents) == 2
        assert parents[0] == V.OWL_THING.replace(basic.iri, "")
        assert not basic.has_local("Class9a", V.RDFS_SUBCLASSOF, "Class1")

    def test_restriction_and_axiom(self, basic):
        # test_core.py:358-377
        assert some("has_demo_property_value", "Class2") in basic.resolved_objs(
            "Class10a", V.RDFS_SUBCLASSOF
        )
        assert basic.has_local("Class11b", V.RDFS_SUBCLASSOF, "Class11a")
        assert some("has_demo_property_value2", "Class2") in basic.resolved_objs(
            "Class10b", V.OWL_EQUIVALENT_CLASS
        )
        assert basic.resolved_objs("Class10c", V.OWL_EQUIVALENT_CLASS) == ["Class10d"]
        assert basic.resolved_objs("Class10d", V.OWL_EQUIVALENT_CLASS) == [
            "Class10e",
            "Class10f",
        ]

    def test_nonfunctional_data_facts(self, basic):
        assert basic.facts("instance1", "has_demo_function_value") == [
            ("801", V.XSD_INTEGER),
            ("802", V.XSD_INTEGER),
        ]
        assert basic.facts("instance5", "has_demo_function_value") == [("805", V.XSD_INTEGER)]


# ---------------------------------------------------------------------------
# error semantics (reference core.py:481-530, 553-555, 566-570, 922-928)
# ---------------------------------------------------------------------------


class TestErrorSemantics:
    def test_unknown_name(self):
        doc = "- owl_individual:\n    foo:\n      types:\n        - NoSuchClass\n"
        with pytest.raises(UnknownEntityError):
            parse_document(doc)

    def test_duplicate_name(self):
        doc = (
            "- owl_class:\n    A:\n      SubClassOf: \"owl:Thing\"\n"
            "- owl_class:\n    A:\n      SubClassOf: \"owl:Thing\"\n"
        )
        with pytest.raises(ParseError, match="declared more than once"):
            parse_document(doc)

    def test_functional_list_value(self):
        doc = """
- owl_class:
    A:
      SubClassOf: "owl:Thing"
- owl_data_property:
    p:
      Domain: A
      Range: int
      Characteristics: [Functional]
- owl_individual:
    a1:
      types: [A]
- property_facts:
    p:
      Facts:
        - a1: [1, 2]
"""
        with pytest.raises(ParseError, match="functional"):
            parse_document(doc)

    def test_object_property_literal_value(self):
        doc = """
- owl_class:
    A:
      SubClassOf: "owl:Thing"
- owl_object_property:
    p:
      Domain: A
      Range: A
- owl_individual:
    a1:
      types: [A]
- property_facts:
    p:
      Facts:
        - a1: some_unresolvable_string
"""
        with pytest.raises(ParseError):
            parse_document(doc)

    def test_multiple_types_not_implemented(self):
        doc = """
- multiple_owl_classes:
    - A:
        SubClassOf: "owl:Thing"
    - B:
        SubClassOf: "owl:Thing"
- owl_individual:
    x:
      types: [A, B]
"""
        with pytest.raises(ParseError, match="multiple types"):
            parse_document(doc)

    def test_multiple_individuals_requires_names(self):
        doc = "- owl_multiple_individuals:\n    types: [\"owl:Thing\"]\n"
        with pytest.raises(ParseError, match="names"):
            parse_document(doc)

    def test_malformed_yaml(self):
        with pytest.raises(ParseError, match="yaml_load"):
            parse_document("- iri: [unclosed\n  bad: ::::")

    def test_inverse_requires_keyword(self):
        doc = """
- owl_object_property:
    p:
      Domain: "owl:Thing"
      Range: "owl:Thing"
- owl_inverse_property:
    q:
      Domain: "owl:Thing"
      Range: "owl:Thing"
"""
        with pytest.raises(ParseError, match="Inverse"):
            parse_document(doc)


# ---------------------------------------------------------------------------
# determinism + demo fallback
# ---------------------------------------------------------------------------


class TestDeterminism:
    def test_identical_runs(self):
        texts = load_fixture_texts()
        imap = build_default_import_map()
        for text in texts.values():
            r1 = parse_document(text, import_map=imap)
            r2 = parse_document(text, import_map=imap)
            assert r1.triples == r2.triples

    def test_demo_ontology_parses(self):
        res = parse_document(DEMO_ONTOLOGY)
        idx = TIndex(res)
        assert idx.facts("luna", "orbits") == ["earth"]
        assert idx.facts("earth", "X_hasObservation_RC") == [
            "iX_Observation_RC_0",
            "iX_Observation_RC_1",
        ]
        assert len(res.rules) == 1


class TestExtraConstructs:
    def test_not_constructor(self):
        doc = """
- iri: "https://x#"
- multiple_owl_classes:
    - A:
        SubClassOf: "owl:Thing"
    - B:
        SubClassOf: "owl:Thing"
        EquivalentTo:
            Not:
                - A
"""
        from kg_assert import TIndex

        idx = TIndex(parse_document(doc))
        eq = idx.resolved_objs("B", V.OWL_EQUIVALENT_CLASS)
        assert eq == [{"_kind": "Class", "complementOf": "A"}]

    def test_large_document_scales_linearly(self):
        # 500 classes + 500 individuals + 1000 facts in one document
        lines = ['- iri: "https://big#"', "- multiple_owl_classes:"]
        lines += [f"    - C{i}:\n        SubClassOf: {'owl:Thing' if i == 0 else f'C{i-1}'}".replace("owl:Thing", '"owl:Thing"') for i in range(500)]
        lines += [
            "- owl_object_property:",
            "    rel:",
            "      Domain: C0",
            "      Range: C0",
        ]
        lines += ["- owl_multiple_individuals:", "    names:"]
        lines += [f"        - i{i}" for i in range(500)]
        lines += ["    types: [C0]"]
        lines += ["- property_facts:", "    rel:", "      Facts:"]
        lines += [f"        - i{i}: [i{(i + 1) % 500}, i{(i + 7) % 500}]" for i in range(500)]
        doc = "\n".join(lines)
        res = parse_document(doc)
        # 500 classes (2 triples) + 500 individuals (2) + prop (3) + 1000 facts + onto
        assert len(res.triples) == 500 * 2 + 500 * 2 + 3 + 1000 + 1

    def test_unicode_everywhere(self):
        doc = (
            '- iri: "https://ü#"\n'
            '- annotation: "héllo wörld — 中文"\n'
            "- owl_class:\n"
            "    Straße:\n"
            '      SubClassOf: "owl:Thing"\n'
        )
        res = parse_document(doc)
        assert ("https://ü#Straße", V.RDF_TYPE, V.OWL_CLASS, False, None) in res.triples
