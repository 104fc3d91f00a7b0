"""RDF / RDFS / OWL / XSD / SWRL vocabulary constants.

These are the public W3C vocabulary IRIs used by the triple emitter.
The reference (cknoll/yamlpyowl) relies on owlready2 to produce the
OWL 2 RDF mapping; we emit the mapping directly (see parser/emit logic
in :mod:`yamlpyowl_spark.parser.document`).
"""

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"
XSD = "http://www.w3.org/2001/XMLSchema#"
SWRL = "http://www.w3.org/2003/11/swrl#"

# local vocabulary for things the RDF mapping has no standard slot for
# (e.g. preserving SWRL rule source text as data, mirroring
# reference core.py:1170-1195 which stores the rule source string)
YPO = "https://w3id.org/yamlpyowl-spark/vocab#"

RDF_TYPE = RDF + "type"
RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"

RDFS_SUBCLASSOF = RDFS + "subClassOf"
RDFS_SUBPROPERTYOF = RDFS + "subPropertyOf"
RDFS_DOMAIN = RDFS + "domain"
RDFS_RANGE = RDFS + "range"
RDFS_COMMENT = RDFS + "comment"
RDFS_LABEL = RDFS + "label"

OWL_ONTOLOGY = OWL + "Ontology"
OWL_CLASS = OWL + "Class"
OWL_THING = OWL + "Thing"
OWL_NOTHING = OWL + "Nothing"
OWL_NAMED_INDIVIDUAL = OWL + "NamedIndividual"
OWL_OBJECT_PROPERTY = OWL + "ObjectProperty"
OWL_DATATYPE_PROPERTY = OWL + "DatatypeProperty"
OWL_FUNCTIONAL = OWL + "FunctionalProperty"
OWL_INVERSE_FUNCTIONAL = OWL + "InverseFunctionalProperty"
OWL_SYMMETRIC = OWL + "SymmetricProperty"
OWL_TRANSITIVE = OWL + "TransitiveProperty"
OWL_INVERSE_OF = OWL + "inverseOf"
OWL_EQUIVALENT_CLASS = OWL + "equivalentClass"
OWL_RESTRICTION = OWL + "Restriction"
OWL_ON_PROPERTY = OWL + "onProperty"
OWL_SOME_VALUES_FROM = OWL + "someValuesFrom"
OWL_HAS_VALUE = OWL + "hasValue"
OWL_UNION_OF = OWL + "unionOf"
OWL_INTERSECTION_OF = OWL + "intersectionOf"
OWL_COMPLEMENT_OF = OWL + "complementOf"
OWL_ONE_OF = OWL + "oneOf"
OWL_IMPORTS = OWL + "imports"
OWL_ALL_DIFFERENT = OWL + "AllDifferent"
OWL_DISTINCT_MEMBERS = OWL + "distinctMembers"

SWRL_IMP = SWRL + "Imp"

YPO_RULE_SRC = YPO + "ruleSrc"

XSD_INTEGER = XSD + "integer"
XSD_DOUBLE = XSD + "double"
XSD_STRING = XSD + "string"
XSD_BOOLEAN = XSD + "boolean"

# characteristic name (as used in YAML) -> rdf:type object IRI
# mirrors reference core.py:154-166 name table seeds
CHARACTERISTIC_IRIS = {
    "Functional": OWL_FUNCTIONAL,
    "InverseFunctional": OWL_INVERSE_FUNCTIONAL,
    "Symmetric": OWL_SYMMETRIC,
    "Transitive": OWL_TRANSITIVE,
}

# python type -> xsd datatype IRI (reference core.py:163-166, 44)
PY_DATATYPE_IRIS = {
    bool: XSD_BOOLEAN,  # must precede int (bool is a subclass of int)
    int: XSD_INTEGER,
    float: XSD_DOUBLE,
    str: XSD_STRING,
}

DEFAULT_ONTOLOGY_IRI = "https://w3id.org/yet/undefined/ontology#"


def literal_datatype(value) -> str:
    """xsd datatype IRI for a python literal value."""
    for py_type, iri in PY_DATATYPE_IRIS.items():
        if isinstance(value, py_type):
            return iri
    raise TypeError(f"unsupported literal type: {type(value)}")


def literal_lexical(value) -> str:
    """Canonical lexical form for a python literal value."""
    if isinstance(value, bool):
        return "true" if value else "false"
    return str(value)
