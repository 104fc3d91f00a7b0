"""RDF/XML serialization (stdlib ElementTree — no rdflib in the
runtime). Parity with the reference CLI's output format: ``yamlpyowl
-c file.owl.yml`` saves RDF/XML next to the input
(/root/reference/src/yamlpyowl/script.py:51, ``onto.save(...,
format="rdfxml")``).

Writer + a minimal reader for the emitted subset (round-trip tested);
the reader is NOT a general RDF/XML parser."""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Iterable, List, Set, Tuple

from . import vocab as V

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

# NCName: no leading digit, no ':'/'#'/'/' etc.
_NCNAME = re.compile(r"^[A-Za-z_][\w.\-]*$")

Row = Tuple[str, str, str, bool, str]  # subj, pred, obj, obj_is_literal, obj_datatype


def split_iri(iri: str) -> Tuple[str, str]:
    """(namespace, localname) with localname a valid XML NCName."""
    for i in range(len(iri) - 1, -1, -1):
        if iri[i] in "#/":
            local = iri[i + 1 :]
            if _NCNAME.match(local):
                return iri[: i + 1], local
            break
    raise ValueError(f"IRI not expressible as an RDF/XML QName: {iri!r}")


def _node_id(blank: str) -> str:
    # "_:36cb..._1" → NCName-safe nodeID ("b36cb..._1")
    return "b" + blank[2:]


def write_rdfxml(rows: Iterable[Row], path: str, base_iri: str = None) -> int:
    """Serialize (subj, pred, obj, obj_is_literal, obj_datatype) rows
    as RDF/XML. Returns the number of triples written."""
    rows = list(rows)
    namespaces = {RDF_NS: "rdf"}

    def prefix_for(ns: str) -> str:
        if ns not in namespaces:
            # ElementTree reserves the "ns<N>" prefix form
            namespaces[ns] = f"p{len(namespaces) - 1}"
        return namespaces[ns]

    by_subj: dict = {}
    for r in rows:
        by_subj.setdefault(r[0], []).append(r)
        prefix_for(split_iri(r[1])[0])

    root = ET.Element(f"{{{RDF_NS}}}RDF")
    if base_iri:
        root.set("{http://www.w3.org/XML/1998/namespace}base", base_iri)
    for subj in sorted(by_subj):
        desc = ET.SubElement(root, f"{{{RDF_NS}}}Description")
        if subj.startswith("_:"):
            desc.set(f"{{{RDF_NS}}}nodeID", _node_id(subj))
        else:
            desc.set(f"{{{RDF_NS}}}about", subj)
        for _, pred, obj, is_lit, dtype in sorted(by_subj[subj], key=lambda r: (r[1], r[2])):
            ns, local = split_iri(pred)
            el = ET.SubElement(desc, f"{{{ns}}}{local}")
            if is_lit:
                el.text = obj
                if dtype and dtype != V.XSD_STRING:
                    el.set(f"{{{RDF_NS}}}datatype", dtype)
            elif obj.startswith("_:"):
                el.set(f"{{{RDF_NS}}}nodeID", _node_id(obj))
            else:
                el.set(f"{{{RDF_NS}}}resource", obj)

    for ns, pfx in namespaces.items():
        ET.register_namespace(pfx, ns)
    tree = ET.ElementTree(root)
    ET.indent(tree)
    tree.write(path, xml_declaration=True, encoding="utf-8")
    return len(rows)


def read_rdfxml(path: str) -> Set[Row]:
    """Read back the subset :func:`write_rdfxml` emits (round-trip
    check; not a general RDF/XML parser — no typed node elements, no
    property attributes, no rdf:parseType).

    Literal datatype contract (RDF 1.1): a literal without an explicit
    ``rdf:datatype`` IS ``xsd:string``, so untyped literals read back
    with ``obj_datatype = xsd:string`` — a Row written with explicit
    ``xsd:string`` round-trips equal (ADVICE r02); writers passing
    ``None`` for a literal mean the same thing and normalize to
    ``xsd:string`` on read."""
    out: Set[Row] = set()
    root = ET.parse(path).getroot()
    for desc in root:
        about = desc.get(f"{{{RDF_NS}}}about")
        node_id = desc.get(f"{{{RDF_NS}}}nodeID")
        subj = about if about is not None else "_:" + node_id[1:]
        for el in desc:
            m = re.match(r"\{(.*)\}(.*)", el.tag)
            pred = m.group(1) + m.group(2)
            res = el.get(f"{{{RDF_NS}}}resource")
            onid = el.get(f"{{{RDF_NS}}}nodeID")
            if res is not None:
                out.add((subj, pred, res, False, None))
            elif onid is not None:
                out.add((subj, pred, "_:" + onid[1:], False, None))
            else:
                dtype = el.get(f"{{{RDF_NS}}}datatype") or V.XSD_STRING
                out.add((subj, pred, el.text or "", True, dtype))
    return out
