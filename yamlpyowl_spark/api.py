"""Drop-in user facade mirroring the reference's ``OntologyManager``.

A user of cknoll/yamlpyowl writes::

    om = ypo.OntologyManager("examples/pizza.owl.yml", world)
    om.n.mypizza1 ...
    om.make_query(sparql)
    om.sync_reasoner(...)

This facade exposes the same session surface on Spark::

    om = OntologyManager("examples/pizza.owl.yml", spark)
    om.triples                      # the triples DataFrame
    om.concepts / om.roles / om.individuals
    om.make_query(sparql)           # set of result names, like the reference
    om.sync_reasoner()              # SWRL forward chain + closure, merged in

Single-document convenience on top of the distributed pipeline — the
same parser, the same operators.
"""

from __future__ import annotations

import os
from typing import Optional, Set

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators.sparql import make_query as _make_query
from .operators.swrl import forward_chain
from .parser.document import DocumentParser
from .schema import SOURCE_SCHEMA
from .sources.fixtures import build_default_import_map


class AnnotationList(list):
    """list with owlready's ``.first()`` convenience
    (reference tests/test_core.py:292 ``om.n.Class4.label.first()``)."""

    def first(self):
        return self[0] if self else None


class EntityHandle:
    """Lightweight stand-in for an owlready2 entity: ``.name``/``.iri``
    /``.kind``, lazily-collected ``label``/``comment``/``is_a``, and
    attribute access to property values — ``om.n.Ukrainian.drinks``
    returns the ``tea`` handle for a functional property, a list for a
    non-functional one (reference Container semantics, core.py:55-69;
    used pervasively in reference tests, e.g. tests/test_core.py:210,
    263)."""

    __slots__ = ("name", "iri", "kind", "_om")

    def __init__(self, name: str, iri: str, kind: str, om: "OntologyManager"):
        self.name = name
        self.iri = iri
        self.kind = kind
        self._om = om

    def _objs(self, pred: str):
        return [
            (r["obj"], r["obj_is_literal"], r["obj_datatype"])
            for r in self._om.triples.filter(
                (F.col("subj") == self.iri) & (F.col("pred") == pred)
            ).collect()
        ]

    def _to_value(self, obj: str, is_lit: bool, dtype):
        from . import vocab as V

        if is_lit:
            if dtype == V.XSD_INTEGER:
                return int(obj)
            if dtype == V.XSD_DOUBLE:
                return float(obj)
            if dtype == V.XSD_BOOLEAN:
                return obj in ("true", "True")
            return obj
        local = obj.replace(self._om.iri, "")
        if local in self._om.n:
            return getattr(self._om.n, local)
        return EntityHandle(local, obj, "entity", self._om)

    @property
    def label(self):
        from . import vocab as V

        return AnnotationList(o for o, _, _ in self._objs(V.RDFS_LABEL))

    @property
    def comment(self):
        from . import vocab as V

        return AnnotationList(o for o, _, _ in self._objs(V.RDFS_COMMENT))

    @property
    def is_a(self):
        from . import vocab as V

        return [
            self._to_value(o, False, None)
            for o, _, _ in self._objs(V.RDF_TYPE)
            if not o.startswith("_:")
        ]

    def __getattr__(self, name: str):
        # property-value access: om.n.Ukrainian.drinks → tea handle.
        # __getattr__ fires only for non-slot attributes; reject dunder
        # probes so copy/pickle don't trigger Spark jobs
        if name.startswith("_"):
            raise AttributeError(name)
        om = self._om
        if name not in om.roles:
            raise AttributeError(
                f"{self.name} has no attribute {name!r} (not a declared property)"
            )
        vals = [self._to_value(*t) for t in self._objs(om.iri + name)]
        from . import vocab as V

        functional = (
            om.triples.filter(
                (F.col("subj") == om.iri + name)
                & (F.col("pred") == V.RDF_TYPE)
                & (F.col("obj") == V.OWL_FUNCTIONAL)
            ).count()
            > 0
        )
        if functional:
            return vals[0] if vals else None
        return vals

    def __repr__(self):
        return f"<{self.kind} {self.name}>"

    def __hash__(self):
        return hash(self.iri)

    def __eq__(self, other):
        return isinstance(other, EntityHandle) and self.iri == other.iri


class NameContainer:
    """``om.n.<name>`` attribute access over every named entity in the
    document (classes, properties, individuals)."""

    def __init__(self, entities: dict):
        self._entities = entities

    def __getattr__(self, name: str) -> EntityHandle:
        try:
            return self._entities[name]
        except KeyError:
            raise AttributeError(f"no entity named {name!r} in this ontology") from None

    def __dir__(self):
        return list(self._entities)

    def __contains__(self, name: str) -> bool:
        return name in self._entities

    def __repr__(self):
        return f"<NameContainer (len={len(self._entities)})>"


class OntologyManager:
    def __init__(
        self,
        fpath_or_content: str,
        spark: SparkSession,
        import_map: Optional[dict] = None,
        repo: str = "local",
        path: str = "ontology.owl.yml",
    ):
        if os.path.exists(fpath_or_content):
            path = fpath_or_content
            with open(fpath_or_content) as fh:
                content = fh.read()
        elif "\n" not in fpath_or_content:
            # single-line arg that isn't a file → almost certainly a path
            # typo, not an inline document
            raise FileNotFoundError(f"no such ontology file: {fpath_or_content}")
        else:
            content = fpath_or_content
        self.spark = spark
        if import_map is None:
            import_map = build_default_import_map()

        # parse once on the driver for the symbol tables (tiny), and hold
        # the triples as a DataFrame for querying (scales out)
        parser = DocumentParser(content, import_map=import_map)
        try:
            result = parser.parse()
        except Exception as err:
            raise ValueError(f"document failed to parse: {err}") from err
        self.iri = result.iri
        self.concepts = [c.name for c in parser.concepts]
        self.roles = {name: r.kind for name, r in parser.roles.items()}
        self.individuals = [i.name for i in parser.individuals]
        self.rules = [r.name for r in result.rules]
        self.n = NameContainer(
            {
                e.name: EntityHandle(e.name, e.iri, e.kind, self)
                for group in (parser.concepts, parser.roles.values(), parser.individuals)
                for e in group
            }
        )

        src = spark.createDataFrame(
            [(repo, path, "0" * 40, "yaml", content)], SOURCE_SCHEMA
        )
        from .plans.pipeline import KGPipeline

        pipe = KGPipeline(spark, import_map=import_map, parse_partitions=1)
        parsed = pipe.parsed(src).persist()
        self.triples: DataFrame = pipe.triples(parsed)
        errors = pipe.errors(parsed).collect()
        if errors:
            raise ValueError(f"document failed to parse: {errors[0]['message']}")
        self._reasoned = False

    def make_query(self, sparql_src: str) -> Set[str]:
        """Single-variable SELECT → set of local names (the reference
        returns a set of entities, core.py:1321-1340)."""
        df = _make_query(self.triples, sparql_src)
        if len(df.columns) == 1:
            return {
                r[0].replace(self.iri, "") if isinstance(r[0], str) else r[0]
                for r in df.collect()
            }
        return {tuple(r) for r in df.collect()}

    def sync_reasoner(self, **_kwargs) -> int:
        """Forward-chain SWRL rules + transitive/inverse axioms, plus
        DL model search for the OneOf/Functional/AllDifferent fragment
        (the zebra puzzle), and merge the inferred facts into
        ``self.triples`` (the reference shells out to Pellet here,
        core.py:1342-1343). Returns #inferred."""
        if self._reasoned:
            return 0
        from .operators.dlreason import dl_model_search

        inferred = (
            forward_chain(self.triples)
            .unionByName(dl_model_search(self.triples))
            .distinct()
        )
        n = inferred.count()
        lineage = self.triples.select(
            "src_repo", "src_path", "src_commit", "src_sha256"
        ).limit(1)
        enriched = inferred.crossJoin(F.broadcast(lineage))
        self.triples = self.triples.unionByName(
            enriched.select(*self.triples.columns)
        ).persist()
        self._reasoned = True
        return n
