"""Access to the reference's test fixture documents.

The reference repo (GPL-3.0) is mounted read-only at /root/reference; we
deliberately do NOT vendor its files into this repository. Fixture
*texts* are read at runtime (tests + corpus synthesis) so the per-row
``sha256(content)`` invariant matches FIXTURES.md exactly. When the
reference checkout is absent, a built-in, independently-authored demo
ontology is used instead so the repo stays self-contained.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

REFERENCE_DIR = os.environ.get("YPO_REFERENCE_DIR", "/root/reference")

# (repo, path-in-corpus, path-in-reference)
FIXTURE_SPECS = [
    ("org/pizza-kb", "examples/pizza.owl.yml", "examples/pizza.owl.yml"),
    ("org/regional-rules", "examples/regional-rules.owl.yml", "examples/regional-rules.owl.yml"),
    ("org/zebra", "examples/einsteins_zebra_riddle.owl.yml", "examples/einsteins_zebra_riddle.owl.yml"),
    (
        "org/basic-feature",
        "tests/test_ontologies/basic_feature_ontology.owl.yml",
        "tests/test_ontologies/basic_feature_ontology.owl.yml",
    ),
]

BFO_RELPATH = "tests/test_ontologies/bfo.owl"

# An independently written ontology document exercising every construct
# the engine supports. Doubles as extra test coverage and as the
# self-contained corpus fallback.
DEMO_ONTOLOGY = """---
- iri: "https://w3id.org/yamlpyowl-spark/demo-solar#"
- annotation: "Demo ontology: bodies of the solar system (authored for yamlpyowl_spark tests)"
- multiple_owl_classes:
    - Body:
        SubClassOf: "owl:Thing"
        annotations: "Any natural body orbiting in the solar system"
    - Star:
        SubClassOf: Body
    - Planet:
        SubClassOf: Body
        labels:
            - Planet (en)
            - Planet (de)
    - Moon:
        SubClassOf: Body
    - GasGiant:
        SubClassOf: Planet
    - RockyPlanet:
        SubClassOf: Planet
    - X_RelationConcept:
        SubClassOf: "owl:Thing"
    - X_Observation_RC:
        SubClassOf: X_RelationConcept
        X_associatedWithClasses:
            - Body
- owl_object_property:
    orbits:
        Domain: Body
        Range: Body
        Characteristics:
            - Functional
- owl_inverse_property:
    orbitedBy:
        Inverse: orbits
- owl_object_property:
    hasNeighbor:
        Domain: Planet
        Range: Planet
        Characteristics:
            - Symmetric
- owl_data_property:
    hasMassKg:
        Domain: Body
        Range: float
        Characteristics:
            - Functional
- owl_data_property:
    hasNickname:
        Domain: Body
        Range: str
- owl_data_property:
    hasObservationQuality:
        Domain: "owl:Thing"
        Range: float
        Characteristics:
            - Functional
- owl_object_property:
    observedBody:
        Domain: "owl:Thing"
        Range: Body
        Characteristics:
            - Functional
- owl_individual:
    sun:
        types:
            - Star
- owl_multiple_individuals:
    names: [mercury, venus, earth, mars]
    types:
        - RockyPlanet
- owl_multiple_individuals:
    names: [jupiter, saturn]
    types:
        - GasGiant
- owl_individual:
    luna:
        types:
            - Moon
- owl_class:
    InnerPlanet:
        EquivalentTo:
            OneOf: [mercury, venus, earth, mars]
- property_facts:
    orbits:
        Facts:
            - mercury: sun
            - venus: sun
            - earth: sun
            - mars: sun
            - jupiter: sun
            - saturn: sun
            - luna: earth
    hasMassKg:
        Facts:
            - earth: 5.97e24
            - luna: 7.34e22
    hasNickname:
        Facts:
            - mars:
                - "Red Planet"
                - unquoted nickname
- relation_concept_facts:
    earth:
        X_hasObservation_RC:
            - observedBody: luna
              hasObservationQuality: 0.9
            - observedBody: mars
              hasObservationQuality: 0.4
- restriction:
    Subject: Planet
    Body:
        orbits:
            some: Star
- restriction:
    Subject: luna
    Body:
        orbits:
            value: earth
- axiom_equivalent_to:
    Subject: GasGiant
    Body:
        Or:
            - hasMassKg:
                value: 1.9e27
            - hasMassKg:
                value: 5.7e26
- swrl_rule:
    name: neighbor_mass
    src: "Planet(?p), orbits(?p, ?s), orbits(?q, ?s) -> hasNeighbor(?p, ?q)"
- different_individuals:
    - __all__
"""


def reference_available() -> bool:
    return os.path.isfile(os.path.join(REFERENCE_DIR, "examples/pizza.owl.yml"))


def load_fixture_texts() -> Dict[str, str]:
    """{corpus_path: content} for the four reference fixtures, or the
    demo fallback when the reference checkout is absent."""
    if not reference_available():
        return {"demo/solar.owl.yml": DEMO_ONTOLOGY}
    out = {}
    for _repo, corpus_path, ref_relpath in FIXTURE_SPECS:
        with open(os.path.join(REFERENCE_DIR, ref_relpath), "r") as fh:
            out[corpus_path] = fh.read()
    return out


def load_bfo_text() -> Optional[str]:
    p = os.path.join(REFERENCE_DIR, BFO_RELPATH)
    if os.path.isfile(p):
        with open(p, "r") as fh:
            return fh.read()
    return None


def build_default_import_map() -> dict:
    from ..parser.imports import build_import_map

    bfo = load_bfo_text()
    if bfo is None:
        return {}
    return build_import_map({"bfo.owl": bfo})
