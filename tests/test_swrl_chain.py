"""SWRL forward chaining reproduces the reference's POST-reasoner
assertions (reference tests/test_core.py:90-116, which need a Java
Pellet subprocess) with pure DataFrame joins."""

import pytest
from pyspark.sql import functions as F

from yamlpyowl_spark.operators.swrl import forward_chain
from yamlpyowl_spark.parser import parse_document
from yamlpyowl_spark.schema import SOURCE_SCHEMA
from yamlpyowl_spark.plans.pipeline import KGPipeline
from yamlpyowl_spark.sources.fixtures import load_fixture_texts, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference fixtures not mounted"
)

RR = "https://w3id.org/yet/undefined/regional-rules-ontology#"


@pytest.fixture(scope="module")
def inferred(spark):
    text = load_fixture_texts()["examples/regional-rules.owl.yml"]
    src = spark.createDataFrame(
        [("org/regional-rules", "examples/regional-rules.owl.yml", "0" * 40, "yaml", text)],
        SOURCE_SCHEMA,
    )
    pipe = KGPipeline(spark, parse_partitions=4)
    triples, _errors = pipe.parse(src)
    return forward_chain(triples).persist()


def _objs(inferred, subj, pred):
    return {
        r["obj"].replace(RR, "")
        for r in inferred.filter(
            (F.col("subj") == RR + subj) & (F.col("pred") == RR + pred)
        ).collect()
    }


def test_transitive_has_part(inferred):
    # test_core.py:92 — leipzig in germany.hasPart after reasoning
    parts = _objs(inferred, "germany", "hasPart")
    assert "leipzig" in parts and "dresden" in parts and "munich" in parts


def test_top_down_rule(inferred):
    # test_core.py:96-101 — dir_rule0 propagates down the hasPart tree
    assert "dir_rule0" in _objs(inferred, "saxony", "hasDirective")
    assert "dir_rule0" in _objs(inferred, "leipzig", "hasDirective")
    assert "dir_rule0" in _objs(inferred, "dresden", "hasDirective")


def test_applicable_doc_rule(inferred):
    # test_core.py:100-101 — directives reach regions via their source docs
    dresden = _objs(inferred, "dresden", "hasDirective")
    assert "dir_rule2" in dresden and "dir_rule3" in dresden


def test_rules_do_not_overfire(inferred):
    # test_core.py:108-109 — rule2/rule3 must NOT reach other bavarian towns
    assert "dir_rule2" not in _objs(inferred, "passau", "hasDirective")
    assert "dir_rule3" not in _objs(inferred, "hof", "hasDirective")


def test_affected_regions_builtin(inferred):
    # test_core.py:111-112 — greaterThan(?v, 0.3) gates the IRR targets
    affected = _objs(inferred, "dir_rule3", "affects")
    assert affected == {"dresden", "passau", "regensburg"}


def test_debug_rule_literal_head(inferred):
    # rule: Debug(?d) -> hasTestValue1(?d, 1)
    rows = inferred.filter(
        (F.col("pred") == RR + "hasTestValue1") & F.col("obj_is_literal")
    ).collect()
    subs = {r["subj"].replace(RR, "") for r in rows}
    assert subs == {"debug1", "debug2", "debug3"}
    assert all(r["obj"] == "1" for r in rows)


def test_inverse_property_inferred(inferred):
    # isPartOf = Inverse(hasPart): leipzig isPartOf saxony is derivable
    assert "saxony" in _objs(inferred, "leipzig", "isPartOf")
