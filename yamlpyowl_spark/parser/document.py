"""Single-document YAML-ontology parser + OWL 2 RDF triple emitter.

This is a from-scratch reimplementation of the *semantics* of
cknoll/yamlpyowl (reference at /root/reference/src/yamlpyowl/core.py) —
not of its implementation. The reference interprets one YAML document
sequentially into owlready2 objects which eagerly write RDF quads; we
interpret the same document sequentially into an in-memory symbol table
and emit the corresponding OWL 2 RDF mapping triples directly.

Design constraints replicated from the reference (see SURVEY.md §1.4):

* names must be declared before use (core.py:481-489, 527-530);
* parsing is one sequential pass over the top-level list
  (core.py:1286-1316) — so one document is always parsed inside a
  single UDF invocation; parallelism is across documents;
* auto-generated RelationConcept individual names are numbered per RC
  type in document order (core.py:1015-1029) — deterministic;
* blank node ids are minted deterministically per document as
  ``_:<sha256(content)[:16]>_<n>`` so output is stable under
  repartitioning, retries and resume.

A document that raises mid-parse produces NO triples and one error row,
matching the reference's observable behavior (OntologyManager.__init__
raises → no usable ontology, core.py:1306-1315).
"""

from __future__ import annotations

import hashlib
import json
import re
from typing import Any, Dict, List, Optional, Tuple, Union

import yaml

# libyaml's C loader is ~10x faster and implements the identical YAML 1.1
# safe schema; parse cost is the pipeline's hot path at 10^12-file scale
_YAML_LOADER = getattr(yaml, "CSafeLoader", yaml.SafeLoader)

from .. import vocab as V
from .model import (
    Construct,
    Ent,
    InverseProp,
    MissingKeywordError,
    ParseError,
    Restriction,
    UnknownEntityError,
    ensure_list,
    unpack_len1_mapping,
)

Triple = Tuple[str, str, str, bool, Optional[str]]

# reference core.py:143 — quoted strings escape name resolution
QUOTED_STRING_RE = re.compile("(^\".*\"$)|(^'.*'$)")
# reference core.py:146 — "bfo:SomeClass" namespace compositum
NS_COMPOSITUM_RE = re.compile("(^.+:.+$)")

# reference core.py:44
BASIC_TYPES = (int, float, str)

_CE_CONSTRUCTORS = ("Or", "And", "Not", "OneOf")
_RESTRICTION_TYPES = ("some", "value")

# keywords whose values must NOT be name-resolved
# (reference core.py:206-233 registration table)
_RAW_LIST_KEYS = ("annotations", "labels")
_PASSTHROUGH_KEYS = ("EquivalentTo", "SubClassOf")


def sha256_hex(content: str) -> str:
    return hashlib.sha256(content.encode("utf-8")).hexdigest()


class SwrlRule:
    """Parsed SWRL rule: source preserved + atoms for forward chaining."""

    __slots__ = ("name", "src", "body_atoms", "head_atoms")

    def __init__(self, name: str, src: str):
        self.name = name
        self.src = src
        self.body_atoms, self.head_atoms = _parse_swrl(src)


_SWRL_ATOM_RE = re.compile(r"([A-Za-z_][\w]*)\(([^()]*)\)")
_SWRL_ARG_RE = re.compile(r'\s*(?:"(?:[^"\\]|\\.)*"|[^,\s][^,]*)')


def _parse_swrl(src: str):
    """Parse 'A(?x), p(?x, ?y) -> q(?x, ?y)' into (body, head) atom lists.

    Each atom is (predicate_name, [args]); args keep their '?'-prefix for
    variables, bare names are constants, numbers are literals. The SWRL
    grammar used by the reference fixtures is only class atoms, property
    atoms and the greaterThan builtin (examples/regional-rules.owl.yml).
    """

    def parse_side(side: str):
        atoms = []
        for m in _SWRL_ATOM_RE.finditer(side):
            name = m.group(1)
            # quote-aware arg split (r6c): a double-quoted string
            # constant may contain commas; unquoted args split as before
            args = [
                a.strip()
                for a in _SWRL_ARG_RE.findall(m.group(2))
                if a.strip()
            ]
            atoms.append((name, args))
        return atoms

    if "->" not in src:
        raise ParseError(f"malformed SWRL rule (no '->'): {src!r}")
    body, head = src.split("->", 1)
    return parse_side(body), parse_side(head)


class ParseResult:
    __slots__ = ("iri", "triples", "rules", "n_constructs")

    def __init__(self, iri: str, triples: List[Triple], rules: List[SwrlRule], n_constructs: int):
        self.iri = iri
        self.triples = triples
        self.rules = rules
        self.n_constructs = n_constructs


class DocumentParser:
    """Parse one YAML ontology document into RDF triples.

    :param content: full YAML text of the document
    :param import_map: optional ``{iri_or_localpath: {"base_iri": str,
        "name": str, "classes": {name: class_iri}}}`` — the broadcast,
        pre-resolved stand-in for the reference's network/file OWL import
        (core.py:1197-1244). No I/O happens here.
    """

    def __init__(self, content: str, import_map: Optional[dict] = None):
        self.content = content
        self.doc_sha = sha256_hex(content)
        self.import_map = import_map or {}

        self.triples: List[Triple] = []
        self.rules: List[SwrlRule] = []
        self._blank_counter = 0
        self._rdf_list_cache: Dict[tuple, str] = {}

        # symbol tables (reference core.py:114-139, 154-186)
        self.name_mapping: Dict[str, Any] = {}
        self.roles: Dict[str, Ent] = {}
        self.concepts: List[Ent] = []
        self.individuals: List[Ent] = []
        self.imported_ontologies: Dict[str, dict] = {}
        self.auto_generated_name_numbers: Dict[str, int] = {}
        self.custom_attribute_store: Dict[tuple, Any] = {}

        # RelationConcept magic state (core.py:132-135)
        self._relation_concept: Optional[Ent] = None
        self._rc_generic_main_role: Optional[Ent] = None

        self.iri = V.DEFAULT_ONTOLOGY_IRI
        self.owl_thing = Ent("Thing", "class", V.OWL_THING)
        self.owl_nothing = Ent("Nothing", "individual", V.OWL_NOTHING)

    # ------------------------------------------------------------------
    # entry point
    # ------------------------------------------------------------------

    def parse(self) -> ParseResult:
        try:
            raw = yaml.load(self.content, Loader=_YAML_LOADER)
        except yaml.YAMLError as err:
            raise ParseError(f"yaml_load: {err}") from err
        if not isinstance(raw, list) or not all(isinstance(d, dict) for d in raw):
            # reference core.py:1255 asserts List[dict]
            raise ParseError("document is not a list of mappings")

        # iri may appear anywhere: union of all top-level dicts
        # (reference core.py:151, 1257-1268)
        all_items = dict(item for dct in raw for item in dct.items())
        iri = all_items.get("iri", V.DEFAULT_ONTOLOGY_IRI)
        if not isinstance(iri, str):
            raise ParseError(f"invalid iri value: {iri!r}")
        self.iri = iri

        self._seed_builtins()
        self._emit(self.iri, V.RDF_TYPE, V.OWL_ONTOLOGY)

        handlers = {
            "import": self.process_import,
            "annotation": self.process_global_annotation,
            "owl_individual": self.make_individual_from_dict,
            "owl_multiple_individuals": self.make_multiple_individuals_from_dict,
            "owl_class": self.make_class_from_dict,
            "multiple_owl_classes": self.make_multiple_classes_from_list,
            "owl_object_property": self.make_object_property_from_dict,
            "owl_data_property": self.make_data_property_from_dict,
            "owl_inverse_property": self.make_inverse_property_from_dict,
            "property_facts": self.make_property_facts_from_dict,
            "relation_concept_facts": self.make_relation_concept_facts_from_dict,
            "restriction": self.add_restriction_from_dict,
            "axiom_equivalent_to": self.add_axiom_equivalent_to,
            "swrl_rule": self.add_swrl_rule_from_dict,
            "different_individuals": self.different_individuals,
        }

        n_constructs = 0
        for top_level_dict in raw:
            if len(top_level_dict) != 1:
                raise ParseError(f"top-level entry must be a length-1 mapping: {top_level_dict!r}")
            key, inner = tuple(top_level_dict.items())[0]
            if key == "iri":  # core.py:235, 1297
                continue
            handler = handlers.get(key)
            if handler is None:
                raise ParseError(f"unknown top-level keyword: {key}")
            try:
                handler(inner)
            except ParseError:
                raise
            except Exception as err:  # enrich context like core.py:1306-1315
                raise ParseError(f"{err} (while parsing: {key})") from err
            n_constructs += 1

        return ParseResult(self.iri, self.triples, self.rules, n_constructs)

    # ------------------------------------------------------------------
    # low-level emission helpers
    # ------------------------------------------------------------------

    def _emit(self, subj: str, pred: str, obj: str, is_lit: bool = False, dtype: Optional[str] = None):
        self.triples.append((subj, pred, obj, is_lit, dtype))

    def _emit_literal(self, subj: str, pred: str, value):
        self._emit(subj, pred, V.literal_lexical(value), True, V.literal_datatype(value))

    def _blank(self) -> str:
        bid = f"_:{self.doc_sha[:16]}_{self._blank_counter}"
        self._blank_counter += 1
        return bid

    def _entity_iri(self, name: str) -> str:
        return self.iri + name

    def _rdf_list(self, refs: List[str]) -> str:
        """Emit an RDF collection (rdf:first/rdf:rest chain); returns head."""
        head = V.RDF_NIL
        for ref in reversed(refs):
            node = self._blank()
            self._emit(node, V.RDF_FIRST, ref)
            self._emit(node, V.RDF_REST, head)
            head = node
        return head

    # ------------------------------------------------------------------
    # symbol table / name resolution (reference core.py:461-530)
    # ------------------------------------------------------------------

    def _seed_builtins(self):
        nm = self.name_mapping
        nm["owl:Thing"] = self.owl_thing
        nm["owl:Nothing"] = self.owl_nothing
        for char in V.CHARACTERISTIC_IRIS:
            nm[char] = ("characteristic", char)
        nm["Inverse"] = ("special", "Inverse")
        nm["int"] = Ent("int", "datatype", V.XSD_INTEGER, py_type=int)
        nm["float"] = Ent("float", "datatype", V.XSD_DOUBLE, py_type=float)
        nm["str"] = Ent("str", "datatype", V.XSD_STRING, py_type=str)
        nm["bool"] = Ent("bool", "datatype", V.XSD_BOOLEAN, py_type=bool)
        for op in ("Or", "And", "Not"):
            nm[op] = ("logic", op)
        for rt in _RESTRICTION_TYPES:  # core.py:182-186
            nm[rt] = rt

    def ensure_is_new_name(self, name: str):
        if name in self.name_mapping:
            raise ParseError(f"This concept name was declared more than once: {name}")

    def resolve_name(self, object_or_name, accept_unquoted_strs: bool = False):
        if isinstance(object_or_name, bool):
            return object_or_name
        if isinstance(object_or_name, (float, int)):
            return object_or_name
        if isinstance(object_or_name, str) and QUOTED_STRING_RE.match(object_or_name):
            return object_or_name  # quoted string stays a literal
        if isinstance(object_or_name, str):
            res, ok = self._resolve_name(object_or_name)
            if ok:
                return res
            if accept_unquoted_strs:
                return object_or_name
            raise UnknownEntityError(f"unknown entity name: {object_or_name}")
        raise ParseError(f"unexpected type ({type(object_or_name)}) of object {object_or_name!r}")

    def _resolve_name(self, name: str):
        if name in self.name_mapping:
            return self.name_mapping[name], True
        if NS_COMPOSITUM_RE.match(name):
            # resolve ns:Name into an imported ontology (core.py:510-518)
            for ns, onto in self.imported_ontologies.items():
                if name.startswith(ns):
                    rest = name.replace(ns, "")
                    class_iri = onto["classes"].get(rest)
                    if class_iri is None:
                        return None, False
                    return Ent(rest, "class", class_iri), True
        return None, False

    # ------------------------------------------------------------------
    # nested-keyword parsing (reference TreeParseFunction, core.py:1435-1541)
    # ------------------------------------------------------------------

    def _atom_or_or(self, arg: list):
        """reference atom_or_Or (core.py:253-265)"""
        if len(arg) == 1:
            return arg[0]
        return Construct("Or", arg)

    def resolve_key_and_value(self, data_dict: dict) -> dict:
        """reference core.py:267-311 (Facts / RC-facts inner dicts)."""
        res = {}
        for raw_key, raw_value in data_dict.items():
            key = self.resolve_name(raw_key)
            if isinstance(raw_value, str):
                value = self.resolve_name(raw_value, accept_unquoted_strs=True)
            elif isinstance(raw_value, list):
                value = [self.resolve_name(e, accept_unquoted_strs=True) for e in raw_value]
            elif isinstance(raw_value, (float, int)):
                value = raw_value
            else:
                raise ParseError(f"Unexpected type: {type(raw_value)} in key-value pair: {data_dict}")
            res[key] = value
        return res

    def _tree_parse(self, keyword: str, arg):
        """Dispatch for one nested keyword — replicates the registration
        table at reference core.py:206-233."""

        if keyword in _PASSTHROUGH_KEYS:  # do_nothing=True
            return arg

        if keyword in _RAW_LIST_KEYS:  # raw strings, promoted to lists
            if isinstance(arg, str):
                return [arg]
            if isinstance(arg, list):
                return list(arg)
            raise ParseError(f"unexpected value for {keyword}: {arg!r}")

        if keyword == "__create_proxy_individual":  # flat passthrough
            return arg

        if keyword == "types":
            if isinstance(arg, list):
                return [self.resolve_name(e) for e in arg]
            if isinstance(arg, str):
                return self.resolve_name(arg)
            raise ParseError(f"unexpected value for types: {arg!r}")

        if keyword in ("Domain", "Range"):
            if isinstance(arg, str):
                arg = [arg]
            if isinstance(arg, list):
                return self._atom_or_or([self.resolve_name(e) for e in arg])
            if isinstance(arg, dict):
                return self._atom_or_or([self._tree_parse_dict_entry(arg)])
            raise ParseError(f"unexpected value for {keyword}: {arg!r}")

        if keyword == "Facts":
            if not isinstance(arg, list):
                raise ParseError(f"Facts expects a list, got: {arg!r}")
            return [self.resolve_key_and_value(d) for d in arg]

        if keyword == "Characteristics":
            if isinstance(arg, str):
                arg = [arg]
            resolved = [self.resolve_name(e) for e in arg]
            out = []
            for item in resolved:
                if not (isinstance(item, tuple) and item[0] == "characteristic"):
                    raise ParseError(f"not a characteristic: {item!r}")
                out.append(item[1])
            return out

        if keyword == "Inverse":
            return self.resolve_name(arg) if isinstance(arg, str) else arg

        if keyword == "X_associatedWithClasses":
            if isinstance(arg, str):
                arg = [arg]
            if isinstance(arg, list):
                return [self.resolve_name(e) for e in arg]
            if isinstance(arg, dict):
                return [self._tree_parse_dict_entry(arg)]
            raise ParseError(f"unexpected value for {keyword}: {arg!r}")

        if keyword == "X_associatedRoles":
            # parsed but unsupported downstream (reference core.py:743)
            raise ParseError("X_associatedRoles is not implemented (matches reference NotImplementedError)")

        if keyword in _CE_CONSTRUCTORS:
            if isinstance(arg, list):
                return Construct(keyword, [self.resolve_name(e) for e in arg])
            if isinstance(arg, str):
                return Construct(keyword, [self.resolve_name(arg)])
            raise ParseError(f"unexpected value for {keyword}: {arg!r}")

        raise ParseError(f"unknown nested keyword: {keyword}")

    def _tree_parse_dict_entry(self, d: dict):
        key, value = unpack_len1_mapping(d)
        return self._tree_parse(key, value)

    def process_tree(self, normal_dict: dict, squeeze: bool = False):
        """reference core.py:1054-1091"""
        if not normal_dict:
            raise ParseError("empty inner mapping")
        res = {}
        key = None
        for key, value in normal_dict.items():
            res[key] = self._tree_parse(key, value)
        if squeeze:
            if len(res) != 1:
                raise ParseError(f"expected exactly one key, got {list(res)}")
            return res[key]
        return res

    # ------------------------------------------------------------------
    # class expressions (reference core.py:630-655)
    # ------------------------------------------------------------------

    def parse_classexpression(self, data):
        if isinstance(data, str):
            return self.resolve_name(data)
        if isinstance(data, list):
            return [self.parse_classexpression(e) for e in data]
        if isinstance(data, dict):
            key, value = unpack_len1_mapping(data)
            if key in _CE_CONSTRUCTORS:
                return Construct(key, ensure_list(self.parse_classexpression(value)))
            if key in self.roles:
                return self.process_restriction_body(data)
            raise ParseError(f"unexpected dict key `{key}` in `{data}`")
        raise ParseError(f"Unexpected type ({type(data)}) of data: {data}")

    # -- restriction grammar (reference PropertyRestrictionParser) -------

    def process_restriction_body(self, data_dict: dict) -> Restriction:
        """Fold nested len-1 dicts right-to-left into a Restriction chain
        (reference core.py:1562-1595)."""
        objects: list = []
        rtypes: List[str] = []
        self._parse_dict_to_lists(data_dict, objects, rtypes)

        arg = objects.pop()
        for rtype, role in zip(reversed(rtypes), reversed(objects)):
            arg = Restriction(role, rtype, arg)
        if not isinstance(arg, Restriction):
            # body was just `SubClassOf: X` → a plain class expression
            return arg
        return arg

    def _parse_dict_to_lists(self, data_dict: dict, objects: list, rtypes: list):
        """reference core.py:1597-1653"""
        key, value = unpack_len1_mapping(data_dict)

        if isinstance(key, str) and key in self.roles:
            objects.append(self.roles[key])
            self._process_role_value_dict(key, value, objects, rtypes)
        elif key == "SubClassOf":
            objects.append(self.parse_classexpression(value))
        elif key == "Inverse":
            inner_key, inner_value = unpack_len1_mapping(value)
            role = self.roles.get(inner_key)
            if role is None:
                raise ParseError(f"A role name is expected after `Inverse:`. Instead got {inner_key}.")
            objects.append(InverseProp(role))
            if not isinstance(inner_value, dict):
                raise ParseError(f"expected mapping after Inverse role, got {inner_value!r}")
            self._process_role_value_dict(key, inner_value, objects, rtypes)
        else:
            raise ParseError(f"Unknown key: {key}. Expected role name.")

    def _process_role_value_dict(self, role_name: str, value_dict, objects: list, rtypes: list):
        """reference core.py:1655-1695"""
        if not isinstance(value_dict, dict):
            raise ParseError(f"malformed restriction near {role_name}: {value_dict!r}")
        inner_key, inner_value = unpack_len1_mapping(value_dict)
        if inner_key not in _RESTRICTION_TYPES:
            raise ParseError(
                f"Malformed restriction: role name {role_name} must be followed by "
                f"restriction type like `some`. Instead got {inner_key}"
            )
        rtypes.append(inner_key)

        if isinstance(inner_value, str):
            objects.append(self.resolve_name(inner_value, accept_unquoted_strs=True))
        elif isinstance(inner_value, (int, float)):
            objects.append(inner_value)
        elif isinstance(inner_value, dict):
            if inner_key != "some":
                raise ParseError(f"nested restriction only allowed under `some`, got {inner_key}")
            self._parse_dict_to_lists(inner_value, objects, rtypes)
        else:
            raise ParseError(f"unexpected restriction filler: {inner_value!r}")

    # ------------------------------------------------------------------
    # class-expression → triples (OWL 2 RDF mapping)
    # ------------------------------------------------------------------

    def expr_ref(self, expr) -> str:
        """Return an IRI or blank-node ref for a class expression,
        emitting the blank-node triple group when needed."""
        if isinstance(expr, Ent):
            return expr.iri
        if isinstance(expr, Construct):
            b = self._blank()
            self._emit(b, V.RDF_TYPE, V.OWL_CLASS)
            if expr.op == "Not":
                inner = self.expr_ref(expr.args[0])
                self._emit(b, V.OWL_COMPLEMENT_OF, inner)
                return b
            pred = {
                "Or": V.OWL_UNION_OF,
                "And": V.OWL_INTERSECTION_OF,
                "OneOf": V.OWL_ONE_OF,
            }[expr.op]
            refs = [self.expr_ref(a) for a in expr.args]
            self._emit(b, pred, self._rdf_list(refs))
            return b
        if isinstance(expr, Restriction):
            b = self._blank()
            self._emit(b, V.RDF_TYPE, V.OWL_RESTRICTION)
            if isinstance(expr.prop, InverseProp):
                binv = self._blank()
                self._emit(binv, V.OWL_INVERSE_OF, expr.prop.prop.iri)
                self._emit(b, V.OWL_ON_PROPERTY, binv)
            else:
                self._emit(b, V.OWL_ON_PROPERTY, expr.prop.iri)
            if expr.rtype == "some":
                self._emit(b, V.OWL_SOME_VALUES_FROM, self.expr_ref(expr.filler))
            else:  # value
                if isinstance(expr.filler, Ent):
                    self._emit(b, V.OWL_HAS_VALUE, expr.filler.iri)
                elif isinstance(expr.filler, BASIC_TYPES + (bool,)):
                    self._emit_literal(b, V.OWL_HAS_VALUE, expr.filler)
                else:
                    raise ParseError(f"unexpected hasValue filler: {expr.filler!r}")
            return b
        raise ParseError(f"cannot emit class expression: {expr!r}")

    # ------------------------------------------------------------------
    # top-level handlers
    # ------------------------------------------------------------------

    def process_global_annotation(self, annotation_str):
        """reference core.py:1246-1248"""
        if not isinstance(annotation_str, str):
            raise ParseError(f"annotation must be a string: {annotation_str!r}")
        self._emit_literal(self.iri, V.RDFS_COMMENT, annotation_str)

    def process_import(self, data_dict: dict):
        """reference core.py:1197-1244 — no I/O: the import target must be
        present in the broadcast ``import_map`` (keyed by iri and by
        localpath basename)."""
        imported_iri = data_dict.get("iri")
        if imported_iri is None:
            raise ParseError(f"Could not find IRI for import. Dict: {data_dict}")
        localpath = data_dict.get("localpath")
        onto = self.import_map.get(imported_iri)
        if onto is None and localpath:
            onto = self.import_map.get(localpath.rsplit("/", 1)[-1])
        if onto is None:
            raise ParseError(f"import target not available offline: {imported_iri}")

        self._emit(self.iri, V.OWL_IMPORTS, imported_iri)
        if "annotations" in data_dict:
            ann = {"import_annotations": data_dict["annotations"]}
            self._emit_literal(imported_iri, V.RDFS_COMMENT, json.dumps(ann))

        self.imported_ontologies[imported_iri] = onto
        ns = data_dict.get("ns", "")
        if ns:
            if not ns.endswith(":"):
                ns = f"{ns}:"
            self.imported_ontologies[ns] = onto
        for cname, ciri in onto["classes"].items():
            self.name_mapping[f"{ns}{cname}"] = Ent(cname, "class", ciri)

    def make_individual_from_dict(self, data_dict: dict):
        """reference core.py:532-546 — note: keys other than `types`
        (e.g. `label:`) are silently ignored, replicating core.py:544."""
        name, inner = unpack_len1_mapping(data_dict)
        self.ensure_is_new_name(name)
        types = self.process_tree({"types": inner.get("types")}, squeeze=True)
        return self._create_individual(name, types)

    def _create_individual(self, name: str, types: List[Ent]) -> Ent:
        """reference core.py:548-558"""
        if not isinstance(types, list) or not types:
            raise ParseError(f"individual {name}: `types` must be a non-empty list")
        if len(types) > 1:
            raise ParseError(f"individual {name}: multiple types not implemented (matches reference)")
        main_type = types[0]
        if not isinstance(main_type, Ent) or main_type.kind != "class":
            raise ParseError(f"individual {name}: type is not a class: {main_type!r}")
        ind = Ent(name, "individual", self._entity_iri(name), types=[main_type])
        self.name_mapping[name] = ind
        self.individuals.append(ind)
        self._emit(ind.iri, V.RDF_TYPE, V.OWL_NAMED_INDIVIDUAL)
        self._emit(ind.iri, V.RDF_TYPE, main_type.iri)
        return ind

    def make_multiple_individuals_from_dict(self, data_dict: dict):
        """reference core.py:560-573"""
        data_dict = dict(data_dict)
        try:
            names = data_dict.pop("names")
        except KeyError:
            raise MissingKeywordError(
                f"Statement `owl_multiple_individuals` must have attribute `names`. {data_dict}"
            )
        for name in names:
            self.make_individual_from_dict({name: dict(data_dict)})

    def make_class_from_dict(self, data_dict: dict) -> Ent:
        """reference core.py:575-628"""
        class_name, inner = unpack_len1_mapping(data_dict)
        if not isinstance(inner, dict):
            raise ParseError(f"owl_class {class_name}: inner value must be a mapping")
        self.ensure_is_new_name(class_name)

        processed = self.process_tree(inner) if inner else {}

        unparsed_sce = inner.get("SubClassOf", "owl:Thing")
        parsed_sce = self.parse_classexpression(unparsed_sce)
        parent_list = list(ensure_list(parsed_sce))
        if not parent_list:
            raise ParseError(f"owl_class {class_name}: empty SubClassOf")
        if not isinstance(parent_list[0], Ent):
            # no named class first → assume owl:Thing (core.py:591-593)
            parent_list.insert(0, self.owl_thing)

        main_parent = parent_list[0]
        new_class = Ent(
            class_name,
            "class",
            self._entity_iri(class_name),
            parents=parent_list,
            main_parent=main_parent if isinstance(main_parent, Ent) else None,
        )
        self.name_mapping[class_name] = new_class
        self.concepts.append(new_class)

        self._emit(new_class.iri, V.RDF_TYPE, V.OWL_CLASS)
        for parent in parent_list:
            self._emit(new_class.iri, V.RDFS_SUBCLASSOF, self.expr_ref(parent))

        for annotation in processed.get("annotations") or []:
            self._emit_literal(new_class.iri, V.RDFS_COMMENT, annotation)
        for label in processed.get("labels") or []:
            self._emit_literal(new_class.iri, V.RDFS_LABEL, label)

        equivalent_to = inner.get("EquivalentTo")
        if equivalent_to:
            for expr in ensure_list(self.parse_classexpression(equivalent_to)):
                self._emit(new_class.iri, V.OWL_EQUIVALENT_CLASS, self.expr_ref(expr))

        self._handle_relation_concept_magic(class_name, new_class, processed)
        self._handle_proxy_individuals(new_class, processed)
        return new_class

    def make_multiple_classes_from_list(self, dict_list: list):
        """reference core.py:782-788"""
        if not isinstance(dict_list, list):
            raise ParseError("multiple_owl_classes expects a list")
        return [self.make_class_from_dict(d) for d in dict_list]

    # -- RelationConcept magic (reference core.py:659-743) ---------------

    def _handle_relation_concept_magic(self, name: str, new_concept: Ent, pid: dict):
        if name == "X_RelationConcept":
            if self._relation_concept is not None:
                raise ParseError("X_RelationConcept declared twice")
            self._relation_concept = new_concept
            self._rc_generic_main_role = self.make_object_property_from_dict(
                {"generic_RC_main_role": {"Domain": "owl:Thing", "Range": "owl:Thing"}}
            )
        elif self._relation_concept is not None and any(
            a is self._relation_concept for a in new_concept.ancestor_chain()
        ):
            if not name.startswith("X_"):
                raise ParseError(
                    "Names of subclasses of `X_RelationConcept` are expected to start with `X_`."
                )
            self._create_rc_roles(new_concept, name, pid)

    def _create_rc_roles(self, relation_concept: Ent, concept_name: str, concept_data: dict):
        if self._relation_concept not in relation_concept.parents:
            raise ParseError(f"{concept_name}: X_RelationConcept must be a direct parent")
        if "X_associatedWithClasses" not in concept_data:
            raise ParseError(f"{concept_name}: missing X_associatedWithClasses")

        main_role_name = f"X_has{concept_name[2:]}"
        domain_list = concept_data["X_associatedWithClasses"]
        main_role = self._create_property(
            main_role_name,
            "object_property",
            domain=list(domain_list),
            range_=[relation_concept],
            characteristics=[],
        )
        # subPropertyOf generic_RC_main_role (core.py:717-719)
        self._emit(main_role.iri, V.RDFS_SUBPROPERTYOF, self._rc_generic_main_role.iri)

        if concept_data.get("X_associatedRoles"):
            raise ParseError("X_associatedRoles is not implemented (matches reference)")

    # -- proxy individuals (reference core.py:745-780) --------------------

    def _handle_proxy_individuals(self, new_class: Ent, processed: dict):
        flag_key = "__create_proxy_individual"
        first_parent = new_class.parents[0]
        flag_value = processed.get(flag_key)
        if flag_value is False:
            return
        if flag_value is None:
            parent_key = getattr(first_parent, "iri", None)
            parent_value = self.custom_attribute_store.get((parent_key, flag_key))
            if parent_value == "recursive":
                flag_value = parent_value
            else:
                return
        flag_value = str(flag_value)
        if flag_value not in ("True", "recursive"):
            raise ParseError(
                f"For the flag {flag_key} only the values True|recursive|False are allowed."
            )
        self.custom_attribute_store[(new_class.iri, flag_key)] = flag_value

        ind_name = f"i{new_class.name}"
        self.ensure_is_new_name(ind_name)
        self._create_individual(ind_name, [new_class])

    # -- properties (reference core.py:790-888) ---------------------------

    def _create_property(self, name, kind, domain, range_, characteristics, inverse_of=None):
        prop = Ent(
            name,
            kind,
            self._entity_iri(name),
            domain=domain,
            range=range_,
            characteristics=list(characteristics),
            inverse_of=inverse_of,
        )
        self.name_mapping[name] = prop
        self.roles[name] = prop

        type_iri = V.OWL_OBJECT_PROPERTY if kind == "object_property" else V.OWL_DATATYPE_PROPERTY
        self._emit(prop.iri, V.RDF_TYPE, type_iri)
        for char in characteristics:
            self._emit(prop.iri, V.RDF_TYPE, V.CHARACTERISTIC_IRIS[char])
        for d in domain:
            self._emit(prop.iri, V.RDFS_DOMAIN, self.expr_ref(d))
        for r in range_:
            self._emit(prop.iri, V.RDFS_RANGE, r.iri if isinstance(r, Ent) else self.expr_ref(r))
        if inverse_of is not None:
            self._emit(prop.iri, V.OWL_INVERSE_OF, inverse_of.iri)
        return prop

    def _make_property_from_dict(self, data_dict: dict, kind: str) -> Ent:
        name, inner = unpack_len1_mapping(data_dict)
        self.ensure_is_new_name(name)

        processed = self.process_tree(inner)
        if "Range" not in processed or "Domain" not in processed:
            raise ParseError(f"property {name}: `Domain` and `Range` are required")
        range_ = ensure_list(processed["Range"])
        domain = ensure_list(processed["Domain"])

        characteristics = processed.get("Characteristics") or []
        prop = self._create_property(name, kind, list(domain), list(range_), characteristics)
        self.process_property_facts(prop, processed)
        return prop

    def make_object_property_from_dict(self, data_dict: dict) -> Ent:
        return self._make_property_from_dict(data_dict, "object_property")

    def make_data_property_from_dict(self, data_dict: dict) -> Ent:
        return self._make_property_from_dict(data_dict, "data_property")

    def make_inverse_property_from_dict(self, data_dict: dict) -> Ent:
        """reference core.py:827-888 — note it deliberately IGNORES any
        declared Domain/Range/Characteristics: domain/range are swapped
        from the existing inverse property and Functional ↔
        InverseFunctional are swapped from its characteristics."""
        name, inner = unpack_len1_mapping(data_dict)
        self.ensure_is_new_name(name)
        processed = self.process_tree(inner)

        existing = processed.get("Inverse")
        if existing is None:
            raise MissingKeywordError(f"keyword `Inverse` is required in owl_inverse_property: {data_dict}")
        if not isinstance(existing, Ent) or not existing.is_property:
            raise ParseError(f"Inverse target is not a property: {existing!r}")

        domain = list(existing.range)
        range_ = list(existing.domain)
        characteristics = []
        if "InverseFunctional" in existing.characteristics:
            characteristics.append("Functional")
        if "Functional" in existing.characteristics:
            characteristics.append("InverseFunctional")

        prop = self._create_property(
            name, existing.kind, domain, range_, characteristics, inverse_of=existing
        )
        self.process_property_facts(prop, processed)
        return prop

    # -- facts (reference core.py:890-1000) --------------------------------

    def make_property_facts_from_dict(self, data_dict: dict):
        for property_name, inner in data_dict.items():
            prop = self.resolve_name(property_name)
            if not isinstance(prop, Ent) or not prop.is_property:
                raise ParseError(f"not a property: {property_name}")
            processed = self.process_tree(inner)
            self.process_property_facts(prop, processed)

    def _is_generalized_thing(self, obj) -> bool:
        """reference core.py:87-100"""
        return isinstance(obj, Ent) and (obj.kind == "individual" or obj is self.owl_nothing)

    def process_property_facts(self, prop: Ent, processed: dict):
        """reference core.py:902-943"""
        for fact in processed.get("Facts") or []:
            key, value = unpack_len1_mapping(fact)
            if not isinstance(key, Ent):
                raise ParseError(f"fact subject did not resolve to an entity: {key!r}")
            for val in ensure_list(value):
                if prop.kind == "object_property" and not self._is_generalized_thing(val):
                    raise ParseError(
                        f"Unexpected type for property {prop.name}: `{val}`. "
                        f"Expected an individual. Probable cause: unresolved key "
                        f"or Concept instead of individual."
                    )
            if prop.is_functional:
                if isinstance(value, list):
                    raise ParseError(
                        f"While assigning range-value of functional property "
                        f"`{prop.name}`: expected scalar but got list: {value}"
                    )
                self._emit_fact(key, prop, value)
            else:
                for val in ensure_list(value):
                    self._emit_fact(key, prop, val)

    def _emit_fact(self, subj: Ent, prop: Ent, value):
        if isinstance(value, Ent):
            if prop.kind == "data_property":
                raise ParseError(
                    f"Unable to store an individual on DataProperty {prop.name}."
                )
            self._emit(subj.iri, prop.iri, value.iri)
        elif isinstance(value, BASIC_TYPES + (bool,)):
            if prop.kind == "object_property":
                raise ParseError(
                    f"Unable to store value of type {type(value)} to ObjectProperty "
                    f"{prop.name}. Probably this should be a DataProperty instead."
                )
            self._emit_literal(subj.iri, prop.iri, value)
        else:
            raise ParseError(f"unexpected fact value: {value!r}")

    # -- relation-concept facts (reference core.py:945-1029) ---------------

    def make_relation_concept_facts_from_dict(self, data_dict: dict):
        for indiv_name, inner in data_dict.items():
            indiv = self.resolve_name(indiv_name)
            if not isinstance(indiv, Ent):
                raise ParseError(f"not an entity: {indiv_name}")
            processed = {}
            for key, value in inner.items():
                key_ent = self.resolve_name(key)
                if not isinstance(value, list):
                    raise ParseError(f"relation_concept_facts value must be a list: {value!r}")
                processed[key_ent] = [self.resolve_key_and_value(d) for d in value]
            self.process_relation_concept_facts(indiv, processed)

    def process_relation_concept_facts(self, indiv: Ent, pid: dict):
        for rc_prop, inner_dict_list in pid.items():
            if not isinstance(rc_prop, Ent) or not rc_prop.is_property:
                raise ParseError(f"Expected a property but got {rc_prop!r}")
            if not rc_prop.range:
                raise ParseError(f"property {rc_prop.name} has no range")
            relation_concept = rc_prop.range[0]
            for inner_dict in inner_dict_list:
                rc_indiv = self._create_new_relation_concept(relation_concept)
                self._emit(indiv.iri, rc_prop.iri, rc_indiv.iri)
                for prop, value in inner_dict.items():
                    if not isinstance(prop, Ent) or not prop.is_property:
                        raise ParseError(f"RC fact key is not a property: {prop!r}")
                    if isinstance(value, Ent) and not self._is_generalized_thing(value):
                        raise ParseError(f"RC fact value must be an individual: {value!r}")
                    if not isinstance(value, BASIC_TYPES + (bool, Ent)):
                        raise ParseError(f"unexpected RC fact value: {value!r}")
                    self._emit_fact(rc_indiv, prop, value)

    def _create_new_relation_concept(self, rc_type: Ent) -> Ent:
        """reference core.py:1015-1029 — deterministic per-type counter."""
        n = self.auto_generated_name_numbers.get(rc_type.name, 0)
        self.auto_generated_name_numbers[rc_type.name] = n + 1
        return self._create_individual(f"i{rc_type.name}_{n}", [rc_type])

    # -- restrictions & axioms (reference core.py:1108-1168) ---------------

    def add_restriction_from_dict(self, data_dict: dict):
        subject_name = data_dict.get("Subject")
        if subject_name is None:
            raise ParseError(f"Key `Subject` not found in: {data_dict}")
        if not isinstance(subject_name, str):
            raise ParseError(f"Subject must be a string: {subject_name!r}")
        subject = self.resolve_name(subject_name)
        body = data_dict.get("Body")
        if body is None:
            raise ParseError(f"Key `Body` not found in: {data_dict}")
        if not isinstance(body, dict):
            raise ParseError(f"restriction Body must be a mapping: {body!r}")

        evaluated = self.process_restriction_body(body)
        ref = self.expr_ref(evaluated)
        if not isinstance(subject, Ent):
            raise ParseError(f"restriction subject did not resolve: {subject_name}")
        if subject.kind == "class":
            self._emit(subject.iri, V.RDFS_SUBCLASSOF, ref)
        elif subject.kind == "individual":
            self._emit(subject.iri, V.RDF_TYPE, ref)
        else:
            raise ParseError(f"restriction subject must be class or individual: {subject_name}")

    def add_axiom_equivalent_to(self, data_dict: dict):
        subject_name = data_dict.get("Subject")
        if not isinstance(subject_name, str):
            raise ParseError(f"Subject must be a string: {subject_name!r}")
        subject = self.resolve_name(subject_name)
        if not isinstance(subject, Ent) or subject.kind != "class":
            raise ParseError(f"axiom_equivalent_to subject must be a class: {subject_name}")
        body = data_dict.get("Body")
        if body is None:
            raise ParseError(f"Key `Body` not found in: {data_dict}")
        for expr in ensure_list(self.parse_classexpression(body)):
            self._emit(subject.iri, V.OWL_EQUIVALENT_CLASS, self.expr_ref(expr))

    # -- swrl / different individuals (reference core.py:1093-1195) --------

    def add_swrl_rule_from_dict(self, data_dict: dict):
        rule_name = data_dict.get("name")
        rule_src = data_dict.get("src")
        if rule_name is None or rule_src is None:
            raise ParseError(f"swrl_rule requires `name` and `src`: {data_dict}")
        rule = SwrlRule(rule_name, rule_src)
        self.rules.append(rule)
        rule_iri = self._entity_iri(rule_name)
        self.name_mapping[rule_name] = Ent(rule_name, "rule", rule_iri)
        self._emit(rule_iri, V.RDF_TYPE, V.SWRL_IMP)
        self._emit_literal(rule_iri, V.YPO_RULE_SRC, rule_src)

    def different_individuals(self, data_list: list):
        if not isinstance(data_list, list) or not all(isinstance(e, str) for e in data_list):
            raise ParseError(f"different_individuals expects a list of names: {data_list!r}")
        individuals = []
        for elt in data_list:
            if elt == "__all__":
                individuals = list(self.individuals)  # creation order, core.py:1098-1100
                break
            ind = self.resolve_name(elt)
            if not self._is_generalized_thing(ind):
                raise ParseError(f"not an individual: {elt}")
            individuals.append(ind)
        b = self._blank()
        self._emit(b, V.RDF_TYPE, V.OWL_ALL_DIFFERENT)
        self._emit(b, V.OWL_DISTINCT_MEMBERS, self._rdf_list([i.iri for i in individuals]))


def parse_document(content: str, import_map: Optional[dict] = None) -> ParseResult:
    """Convenience wrapper: parse one YAML ontology document."""
    return DocumentParser(content, import_map=import_map).parse()
