"""SPARQL extensions beyond the reference's own BGP usage: FILTER
comparisons, UNION, OPTIONAL (left join) — compiled to DataFrame ops,
rejecting the genuinely unsupported constructs loudly."""

import pytest
from pyspark.sql import types as T

from yamlpyowl_spark.operators.sparql import SparqlError, make_query, parse_sparql

SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("obj", T.StringType()),
        T.StructField("obj_is_literal", T.BooleanType()),
        T.StructField("obj_datatype", T.StringType()),
        T.StructField("doc_iri", T.StringType()),
    ]
)

E = "http://ex.org/"


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        (E + "a", E + "age", "30", True, None, E),
        (E + "b", E + "age", "7", True, None, E),
        (E + "c", E + "age", "45", True, None, E),
        (E + "a", E + "knows", E + "b", False, None, E),
        (E + "b", E + "likes", E + "c", False, None, E),
        (E + "a", E + "name", "alice", True, None, E),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _q(triples, body):
    return make_query(triples, f"PREFIX e: <{E}> SELECT {body}")


def test_filter_numeric(triples):
    got = {r[0] for r in _q(triples, "?x WHERE { ?x e:age ?a . FILTER(?a > 10) }").collect()}
    assert got == {E + "a", E + "c"}


def test_filter_conjunction(triples):
    got = {
        r[0]
        for r in _q(
            triples, "?x WHERE { ?x e:age ?a . FILTER(?a > 10 && ?a < 40) }"
        ).collect()
    }
    assert got == {E + "a"}


def test_filter_string_equality(triples):
    got = {r[0] for r in _q(triples, '?x WHERE { ?x e:name ?n . FILTER(?n = "alice") }').collect()}
    assert got == {E + "a"}


def test_union(triples):
    got = {
        r[0]
        for r in _q(
            triples, "?y WHERE { { e:a e:knows ?y } UNION { e:b e:likes ?y } }"
        ).collect()
    }
    assert got == {E + "b", E + "c"}


def test_optional_left_join(triples):
    rows = {
        tuple(r)
        for r in _q(
            triples, "?x ?y WHERE { ?x e:age ?a . OPTIONAL { ?x e:knows ?y } }"
        ).collect()
    }
    assert rows == {(E + "a", E + "b"), (E + "b", None), (E + "c", None)}


def test_union_branch_mismatch_rejected(triples):
    with pytest.raises(SparqlError, match="same variables"):
        _q(triples, "?x WHERE { { ?x e:age ?a } UNION { e:a e:knows ?y } }")


def test_minus(triples):
    # subjects with an age but NO name binding
    got = {
        r[0]
        for r in _q(triples, "?x WHERE { ?x e:age ?a MINUS { ?x e:name ?n } }").collect()
    }
    assert got == {E + "b", E + "c"}


def test_minus_no_shared_vars_removes_nothing(triples):
    got = {
        r[0]
        for r in _q(triples, "?x WHERE { ?x e:age ?a MINUS { ?z e:name ?n } }").collect()
    }
    assert got == {E + "a", E + "b", E + "c"}


def test_values_single_var(triples):
    got = {
        r[0]
        for r in _q(
            triples, "?x WHERE { ?x e:age ?a . VALUES ?x { e:a e:c } }"
        ).collect()
    }
    assert got == {E + "a", E + "c"}


def test_values_tuple(triples):
    got = {
        tuple(r)
        for r in _q(
            triples,
            '?x ?n WHERE { ?x e:name ?n . VALUES (?x ?n) { (e:a "alice") (e:b "bob") } }',
        ).collect()
    }
    assert got == {(E + "a", "alice")}


def test_values_standalone(triples):
    got = {r[0] for r in _q(triples, "?x WHERE { VALUES ?x { e:a e:zz } }").collect()}
    assert got == {E + "a", E + "zz"}


def test_filter_var_var(triples):
    got = {
        tuple(r)
        for r in _q(
            triples,
            "?x ?y WHERE { ?x e:age ?a . ?y e:age ?b . FILTER(?a < ?b) }",
        ).collect()
    }
    assert got == {
        (E + "b", E + "a"),
        (E + "b", E + "c"),
        (E + "a", E + "c"),
    }


def test_filter_var_var_equality_is_lexical(triples):
    got = {
        tuple(r)
        for r in _q(
            triples,
            "?x ?y WHERE { ?x e:age ?a . ?y e:age ?b . FILTER(?a = ?b) }",
        ).collect()
    }
    assert got == {(E + "a", E + "a"), (E + "b", E + "b"), (E + "c", E + "c")}


def test_filter_regex(triples):
    got = {
        r[0]
        for r in _q(
            triples, '?x WHERE { ?x e:name ?n . FILTER(regex(?n, "^ali")) }'
        ).collect()
    }
    assert got == {E + "a"}


def test_bind_arith(triples):
    got = {
        (r[0], r[1])
        for r in _q(
            triples,
            "?x ?d WHERE { ?x e:age ?a . BIND(?a * 2 AS ?d) . FILTER(?a > 40) }",
        ).collect()
    }
    assert got == {(E + "c", 90.0)}


def test_bind_rebind_rejected(triples):
    with pytest.raises(SparqlError, match="already bound"):
        _q(triples, "?x WHERE { ?x e:age ?a . BIND(1 AS ?a) }")


def test_still_unsupported_rejected(triples):
    with pytest.raises(SparqlError, match="SERVICE"):
        _q(triples, "?x WHERE { SERVICE <http://remote> { ?x e:age ?a } }")
    with pytest.raises(SparqlError, match="never bound"):
        _q(triples, "?zzz WHERE { ?x e:age ?a }")


def test_legacy_parse_sparql_still_bgp_only():
    sel, pats = parse_sparql(f"PREFIX e: <{E}> SELECT ?x WHERE {{ ?x e:age ?a . }}")
    assert sel == ["?x"] and pats == [("?x", E + "age", "?a")]
    with pytest.raises(SparqlError, match="make_query"):
        parse_sparql(f"PREFIX e: <{E}> SELECT ?x WHERE {{ ?x e:age ?a . FILTER(?a > 1) }}")


# ---------------------------------------------------------------------------
# fuzz: arbitrary input must parse or raise SparqlError — never hang,
# never escape with a different exception type
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

from yamlpyowl_spark.operators.sparql import _parse


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_sparql_fuzz_arbitrary_text(src):
    try:
        _parse(src)
    except SparqlError:
        pass


_SOUP = st.lists(
    st.sampled_from(
        ["SELECT", "WHERE", "{", "}", "(", ")", "FILTER", "UNION", "OPTIONAL",
         "MINUS", "VALUES", "BIND", "AS", "regex", ",", "+", "*", "/", "-", "|", "^",
         "?x", "?y", "<http://e#p>", '"lit"', "42", "e:name", ".", "&&", ">", "=",
         "PREFIX e: <http://e#>",
         "GROUP", "BY", "ORDER", "LIMIT", "DESC(?x)", "ASC(?y)", "?",
         "(COUNT(?x) AS ?n)", "(SUM(?y) AS ?s)", "COUNT", "AS",
         # r5 FILTER grammar surface
         "||", "!", "IN", "NOT", "bound", "isIRI", "isLiteral", "isBlank",
         "STR", "LANG", "DATATYPE", "STRLEN", "UCASE", "LCASE",
         "STRSTARTS", "STRENDS", "CONTAINS", "EXISTS",
         "DESCRIBE", "ASK", "CONSTRUCT", "GRAPH", "HAVING", "OFFSET",
         # r6 value-expression / path surface
         "SUBSTR", "REPLACE", "CONCAT", "ABS", "CEIL", "FLOOR", "ROUND",
         "COALESCE", "IF", "sameTerm", "!", "SAMPLE", "GROUP_CONCAT",
         ";", 'SEPARATOR="-"', "(GROUP_CONCAT(?x) AS ?g)",
         "(SAMPLE(?y) AS ?s1)", "(?x + 1 AS ?e)",
         # r6 second function batch
         "STRBEFORE", "STRAFTER", "MD5", "SHA1", "SHA256", "YEAR",
         "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS", "isNumeric",
         "langMatches", "ENCODE_FOR_URI", "TZ", "IRI", "URI", "NOW",
         "DISTINCT", "(SUM(DISTINCT ?x) AS ?sd)",
         # r6d sugar / clause surface
         ";", "a", "[", "]", "_:b", "(", ")", "REDUCED",
         "VALUES ?x { <http://e#a> }", "DESC(COUNT(?x))",
         "FROM", "NAMED", "( ?x )", "[ e:name ?v ]"]
    ),
    max_size=25,
)


@settings(max_examples=300, deadline=None)
@given(_SOUP)
def test_sparql_fuzz_token_soup(parts):
    try:
        _parse(" ".join(parts))
    except SparqlError:
        pass


@pytest.fixture(scope="module")
def graph(spark):
    # a -p-> b -p-> c -p-> d; c -q-> x
    rows = [
        (E + "a", E + "p", E + "b", False, None, E),
        (E + "b", E + "p", E + "c", False, None, E),
        (E + "c", E + "p", E + "d", False, None, E),
        (E + "c", E + "q", E + "x", False, None, E),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_path_plus_closure(graph):
    got = {
        tuple(r)
        for r in make_query(
            graph, f"PREFIX e: <{E}> SELECT ?x ?y WHERE {{ ?x e:p+ ?y }}"
        ).collect()
    }
    assert got == {
        (E + "a", E + "b"), (E + "a", E + "c"), (E + "a", E + "d"),
        (E + "b", E + "c"), (E + "b", E + "d"), (E + "c", E + "d"),
    }


def test_path_sequence(graph):
    got = {
        r[0]
        for r in make_query(
            graph, f"PREFIX e: <{E}> SELECT ?s WHERE {{ ?s e:p/e:q ?v }}"
        ).collect()
    }
    assert got == {E + "b"}


def test_path_closure_then_step(graph):
    # p+ then q: everything that reaches c via p then hops q
    got = {
        tuple(r)
        for r in make_query(
            graph, f"PREFIX e: <{E}> SELECT ?s ?v WHERE {{ ?s e:p+/e:q ?v }}"
        ).collect()
    }
    assert got == {(E + "a", E + "x"), (E + "b", E + "x")}


def test_path_constant_endpoints(graph):
    got = {
        r[0]
        for r in make_query(
            graph, f"PREFIX e: <{E}> SELECT ?y WHERE {{ e:a e:p+ ?y }}"
        ).collect()
    }
    assert got == {E + "b", E + "c", E + "d"}


def test_path_joins_other_patterns(graph):
    got = {
        tuple(r)
        for r in make_query(
            graph,
            f"PREFIX e: <{E}> SELECT ?x ?v WHERE {{ ?x e:p+ ?y . ?y e:q ?v }}",
        ).collect()
    }
    assert got == {(E + "a", E + "x"), (E + "b", E + "x")}


def test_path_var_predicate_rejected(graph):
    with pytest.raises(SparqlError, match="propert"):
        make_query(graph, f"PREFIX e: <{E}> SELECT ?x WHERE {{ ?x ?p/e:q ?y }}")
    with pytest.raises(SparqlError, match="concrete predicate"):
        make_query(graph, f"PREFIX e: <{E}> SELECT ?x WHERE {{ ?x ?p+ ?y }}")


def test_path_inverse_single(graph):
    got = {
        r[0]
        for r in make_query(
            graph, f"PREFIX e: <{E}> SELECT ?x WHERE {{ ?x ^e:p e:c }}"
        ).collect()
    }
    assert got == {E + "d"}  # c -p-> d, so d ^p c


def test_path_alternation(graph):
    got = {
        tuple(r)
        for r in make_query(
            graph, f"PREFIX e: <{E}> SELECT ?s ?v WHERE {{ ?s e:p|e:q ?v }}"
        ).collect()
    }
    assert got == {
        (E + "a", E + "b"), (E + "b", E + "c"), (E + "c", E + "d"),
        (E + "c", E + "x"),
    }


def test_path_grouped_alternation_closure(graph):
    # (p|q)+ from a reaches everything downstream via either relation
    got = {
        r[0]
        for r in make_query(
            graph, f"PREFIX e: <{E}> SELECT ?y WHERE {{ e:a (e:p|e:q)+ ?y }}"
        ).collect()
    }
    assert got == {E + "b", E + "c", E + "d", E + "x"}


def test_path_inverse_in_sequence(graph):
    # x ^q/^p: from x back over q to c, then back over p to b
    got = {
        r[0]
        for r in make_query(
            graph, f"PREFIX e: <{E}> SELECT ?y WHERE {{ e:x ^e:q/^e:p ?y }}"
        ).collect()
    }
    assert got == {E + "b"}


def test_path_inverse_var_pred_rejected(graph):
    with pytest.raises(SparqlError, match="concrete predicate"):
        make_query(graph, f"PREFIX e: <{E}> SELECT ?x WHERE {{ ?x ^?p e:c }}")


# ---------------------------------------------------------------------------
# round 4: zero-length paths, aggregates, GROUP BY, ORDER BY / LIMIT
# ---------------------------------------------------------------------------


def test_path_star_constant_start(graph):
    # zero-or-more includes the start itself (SPARQL 1.1 §9.3)
    got = {
        r[0]
        for r in make_query(
            graph, f"PREFIX e: <{E}> SELECT ?y WHERE {{ e:a e:p* ?y }}"
        ).collect()
    }
    assert got == {E + "a", E + "b", E + "c", E + "d"}


def test_path_star_constant_not_in_graph(graph):
    # a constant endpoint absent from the graph still matches itself
    got = {
        r[0]
        for r in make_query(
            graph, f"PREFIX e: <{E}> SELECT ?y WHERE {{ e:zzz e:p* ?y }}"
        ).collect()
    }
    assert got == {E + "zzz"}


def test_path_qmark_zero_or_one(graph):
    got = {
        r[0]
        for r in make_query(
            graph, f"PREFIX e: <{E}> SELECT ?y WHERE {{ e:a e:p? ?y }}"
        ).collect()
    }
    assert got == {E + "a", E + "b"}


def test_path_star_in_sequence(graph):
    # q then p*: x has no q out-edges; c -q-> x so start at c: c q x, then x p* → {x}
    got = {
        r[0]
        for r in make_query(
            graph, f"PREFIX e: <{E}> SELECT ?y WHERE {{ e:c e:q/e:p* ?y }}"
        ).collect()
    }
    assert got == {E + "x"}


# ---------------------------------------------------------------------------
# r6c: path grammar completion — groups nest under modifiers/inverse,
# and `/` binds tighter than `|` (SPARQL 1.1 §18.2.2 precedence)
# ---------------------------------------------------------------------------


def test_path_grouped_sequence_closure(graph):
    # (p/p)+ closes over the COMPOSED relation {(a,c),(b,d)}
    got = {
        tuple(r)
        for r in make_query(
            graph, f"PREFIX e: <{E}> SELECT ?x ?y WHERE {{ ?x (e:p/e:p)+ ?y }}"
        ).collect()
    }
    assert got == {(E + "a", E + "c"), (E + "b", E + "d")}


def test_path_inverse_of_group(graph):
    # ^(p|q): only c reaches x over q, so x ^(p|q) = {c}
    got = {
        r[0]
        for r in make_query(
            graph, f"PREFIX e: <{E}> SELECT ?y WHERE {{ e:x ^(e:p|e:q) ?y }}"
        ).collect()
    }
    assert got == {E + "c"}


def test_path_alt_seq_precedence(graph):
    # unparenthesized q|p/q parses as q|(p/q): {c (via q), b (via p/q)}
    got = {
        r[0]
        for r in make_query(
            graph, f"PREFIX e: <{E}> SELECT ?s WHERE {{ ?s e:q|e:p/e:q e:x }}"
        ).collect()
    }
    assert got == {E + "b", E + "c"}


def test_path_grouped_sequence_optional(graph):
    # (p/q)?: identity (b itself) plus the composed hop b -p-> c -q-> x
    got = {
        r[0]
        for r in make_query(
            graph, f"PREFIX e: <{E}> SELECT ?y WHERE {{ e:b (e:p/e:q)? ?y }}"
        ).collect()
    }
    assert got == {E + "b", E + "x"}


def test_path_inverse_of_closure(graph):
    # ^(p+) = everything that reaches d via p+
    got = {
        r[0]
        for r in make_query(
            graph, f"PREFIX e: <{E}> SELECT ?y WHERE {{ e:d ^(e:p+) ?y }}"
        ).collect()
    }
    assert got == {E + "a", E + "b", E + "c"}


def test_path_nested_group_closure(graph):
    # ((p/p)|q)+ over composed edges {(a,c),(b,d),(c,x)}: from a → c → x
    got = {
        r[0]
        for r in make_query(
            graph,
            f"PREFIX e: <{E}> SELECT ?y WHERE {{ e:a ((e:p/e:p)|e:q)+ ?y }}",
        ).collect()
    }
    assert got == {E + "c", E + "x"}


def test_path_negated_set_with_modifier(graph):
    # !(q)+ = closure over every non-q edge (here: the p chain)
    got = {
        r[0]
        for r in make_query(
            graph, f"PREFIX e: <{E}> SELECT ?y WHERE {{ e:a !(e:q)+ ?y }}"
        ).collect()
    }
    assert got == {E + "b", E + "c", E + "d"}


def test_path_var_inside_group_rejected(graph):
    with pytest.raises(SparqlError, match="propert"):
        make_query(
            graph, f"PREFIX e: <{E}> SELECT ?x WHERE {{ ?x (e:p/?v) ?y }}"
        )


def test_agg_count_group_by(triples):
    rows = {
        (r["x"], r["n"])
        for r in _q(
            triples,
            "?x (COUNT(?a) AS ?n) WHERE { ?x e:age ?a } GROUP BY ?x",
        ).collect()
    }
    assert rows == {(E + "a", 1), (E + "b", 1), (E + "c", 1)}


def test_agg_global_count_star(triples):
    [row] = _q(triples, "(COUNT(*) AS ?n) WHERE { ?x e:age ?a }").collect()
    assert row["n"] == 3


def test_agg_count_distinct(triples):
    [row] = _q(
        triples, "(COUNT(DISTINCT ?p) AS ?n) WHERE { ?x ?p ?o }"
    ).collect()
    assert row["n"] == 4  # age, knows, likes, name — distinct predicates


def test_agg_sum_avg_min_max(triples):
    [row] = _q(
        triples,
        "(SUM(?a) AS ?s) (AVG(?a) AS ?m) (MIN(?a) AS ?lo) (MAX(?a) AS ?hi) "
        "WHERE { ?x e:age ?a }",
    ).collect()
    assert row["s"] == 82.0
    assert abs(row["m"] - 82.0 / 3) < 1e-9
    # MIN/MAX are lexical over string-typed columns (dialect note)
    assert row["lo"] == "30" and row["hi"] == "7"


def test_agg_multiset_semantics(spark):
    # aggregation runs over the solution multiset, not the distinct set
    rows = [
        (E + "a", E + "p", E + "b", False, None, E),
        (E + "a", E + "p", E + "c", False, None, E),
    ]
    t = spark.createDataFrame(rows, SCHEMA)
    [row] = make_query(
        t, f"PREFIX e: <{E}> SELECT (COUNT(?y) AS ?n) WHERE {{ e:a e:p ?y }}"
    ).collect()
    assert row["n"] == 2


def test_agg_nongrouped_var_rejected(triples):
    with pytest.raises(SparqlError, match="GROUP BY"):
        _q(triples, "?x (COUNT(?a) AS ?n) WHERE { ?x e:age ?a }")


def test_order_by_limit(triples):
    rows = _q(
        triples,
        "?x ?a WHERE { ?x e:age ?a } ORDER BY DESC(?a) LIMIT 2",
    ).collect()
    # lexical ordering of the string column: "7" > "45" > "30"
    assert [r["a"] for r in rows] == ["7", "45"]


def test_order_by_agg_alias(triples):
    rows = _q(
        triples,
        "?p (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p ORDER BY DESC(?n) ?p LIMIT 2",
    ).collect()
    assert rows[0]["p"] == E + "age" and rows[0]["n"] == 3
    assert rows[1]["n"] == 1


def test_order_by_unprojected_rejected(triples):
    with pytest.raises(SparqlError, match="unprojected"):
        _q(triples, "?x WHERE { ?x e:age ?a } ORDER BY ?a")


def test_limit_without_order(triples):
    assert len(_q(triples, "?x WHERE { ?x e:age ?a } LIMIT 2").collect()) == 2


def test_having_offset_supported_as_of_r4(triples):
    # round 4a rejected these; round 4c compiles them (see the HAVING
    # and OFFSET tests below) — malformed HAVING still raises loudly
    with pytest.raises(SparqlError, match="HAVING supports"):
        _q(triples, "?x (COUNT(?a) AS ?n) WHERE { ?x e:age ?a } GROUP BY ?x HAVING (?n + 1)")
    assert len(_q(triples, "?x WHERE { ?x e:age ?a } LIMIT 2 OFFSET 1").collect()) == 2


def test_modifier_garbage_rejected(triples):
    with pytest.raises(SparqlError, match="cannot parse after WHERE"):
        _q(triples, "?x WHERE { ?x e:age ?a } SORT BY ?x")


# ---------------------------------------------------------------------------
# round 4b: ASK and CONSTRUCT query forms
# ---------------------------------------------------------------------------

from yamlpyowl_spark.operators.sparql import ask_query, construct_query


def test_ask_true_false(triples):
    assert ask_query(triples, f"PREFIX e: <{E}> ASK {{ ?x e:age ?a . FILTER(?a > 40) }}")
    assert not ask_query(
        triples, f"PREFIX e: <{E}> ASK {{ ?x e:age ?a . FILTER(?a > 100) }}"
    )


def test_ask_via_make_query(triples):
    [row] = make_query(triples, f"PREFIX e: <{E}> ASK {{ ?x e:knows ?y }}").collect()
    assert row["ask"] is True


def test_construct_rewrites_predicates(triples):
    got = {
        tuple(r)
        for r in construct_query(
            triples,
            f"PREFIX e: <{E}> CONSTRUCT {{ ?y e:knownBy ?x }} WHERE {{ ?x e:knows ?y }}",
        ).collect()
    }
    assert got == {(E + "b", E + "knownBy", E + "a")}


def test_construct_multi_template_and_constants(triples):
    got = {
        tuple(r)
        for r in construct_query(
            triples,
            f"PREFIX e: <{E}> CONSTRUCT {{ ?x e:isAdult e:yes . ?x e:checked e:yes }} "
            f"WHERE {{ ?x e:age ?a . FILTER(?a > 10) }}",
        ).collect()
    }
    assert got == {
        (E + "a", E + "isAdult", E + "yes"),
        (E + "c", E + "isAdult", E + "yes"),
        (E + "a", E + "checked", E + "yes"),
        (E + "c", E + "checked", E + "yes"),
    }


def test_construct_unbound_template_var_rejected(triples):
    with pytest.raises(SparqlError, match="never bound"):
        construct_query(
            triples,
            f"PREFIX e: <{E}> CONSTRUCT {{ ?z e:p ?x }} WHERE {{ ?x e:knows ?y }}",
        )


def test_construct_template_path_rejected(triples):
    with pytest.raises(SparqlError, match="only plain triples"):
        construct_query(
            triples,
            f"PREFIX e: <{E}> CONSTRUCT {{ ?x e:p+ ?y }} WHERE {{ ?x e:knows ?y }}",
        )


# ---------------------------------------------------------------------------
# round 4c: HAVING and OFFSET
# ---------------------------------------------------------------------------


def test_having_alias(triples):
    rows = _q(
        triples,
        "?p (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p HAVING (?n > 2)",
    ).collect()
    assert [(r["p"], r["n"]) for r in rows] == [(E + "age", 3)]


def test_having_inline_aggregate(triples):
    got = {
        r["p"]
        for r in _q(
            triples,
            "?p (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p HAVING (COUNT(?o) < 2)",
        ).collect()
    }
    assert got == {E + "knows", E + "likes", E + "name"}
    # the hidden __having column never leaks into the projection
    df = _q(
        triples,
        "?p (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p HAVING (COUNT(?o) < 2)",
    )
    assert df.columns == ["p", "n"]


def test_having_without_aggregates_rejected(triples):
    with pytest.raises(SparqlError, match="HAVING requires aggregates"):
        _q(triples, "?x WHERE { ?x e:age ?a } HAVING (?a > 1)")


def test_having_unknown_alias_rejected(triples):
    with pytest.raises(SparqlError, match="not a SELECT aggregate"):
        _q(
            triples,
            "?p (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p HAVING (?zz > 2)",
        )


def test_offset_with_order(triples):
    rows = _q(
        triples, "?x ?a WHERE { ?x e:age ?a } ORDER BY ?a LIMIT 2 OFFSET 1"
    ).collect()
    # lexical order: "30" < "45" < "7"; skip 1, take 2
    assert [r["a"] for r in rows] == ["45", "7"]


def test_offset_beyond_result(triples):
    assert _q(triples, "?x WHERE { ?x e:age ?a } OFFSET 99").collect() == []


# ---------------------------------------------------------------------------
# round 4d: FILTER EXISTS / NOT EXISTS
# ---------------------------------------------------------------------------


def test_filter_exists(triples):
    got = {
        r[0]
        for r in _q(
            triples, "?x WHERE { ?x e:age ?a . FILTER EXISTS { ?x e:knows ?y } }"
        ).collect()
    }
    assert got == {E + "a"}


def test_filter_not_exists(triples):
    got = {
        r[0]
        for r in _q(
            triples, "?x WHERE { ?x e:age ?a . FILTER NOT EXISTS { ?x e:knows ?y } }"
        ).collect()
    }
    assert got == {E + "b", E + "c"}


def test_filter_exists_no_shared_vars(triples):
    # satisfiable pattern with no shared vars keeps every row ...
    got = _q(
        triples, "?x WHERE { ?x e:age ?a . FILTER EXISTS { ?z e:likes ?w } }"
    ).collect()
    assert len(got) == 3
    # ... an unsatisfiable one keeps none
    got = _q(
        triples, "?x WHERE { ?x e:age ?a . FILTER EXISTS { ?z e:hates ?w } }"
    ).collect()
    assert got == []


def test_filter_not_exists_with_pattern_constants(triples):
    got = {
        r[0]
        for r in _q(
            triples, "?x WHERE { ?x e:age ?a . FILTER NOT EXISTS { ?x e:name \"alice\" } }"
        ).collect()
    }
    assert got == {E + "b", E + "c"}


def test_filter_not_without_exists_rejected(triples):
    with pytest.raises(SparqlError, match="expected EXISTS"):
        _q(triples, "?x WHERE { ?x e:age ?a . FILTER NOT regex(?a, \"3\") }")


# ---------------------------------------------------------------------------
# round 5: DESCRIBE
# ---------------------------------------------------------------------------


def test_describe_constant(triples):
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in make_query(triples, f"DESCRIBE <{E}a>").collect()
    }
    assert got == {
        (E + "a", E + "age", "30"),
        (E + "a", E + "knows", E + "b"),
        (E + "a", E + "name", "alice"),
    }


def test_describe_var_where(triples):
    # every subject that knows someone → all of a's triples
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in _mq(triples, "DESCRIBE ?x WHERE { ?x e:knows ?y }").collect()
    }
    assert {s for s, _, _ in got} == {E + "a"}
    assert len(got) == 3


def test_describe_mixed_and_multiple(triples):
    got = {
        r["subj"]
        for r in _mq(
            triples, f"DESCRIBE <{E}c> ?x WHERE {{ ?x e:likes ?y }}"
        ).collect()
    }
    # b likes c; c has an age triple
    assert got == {E + "b", E + "c"}


def test_describe_var_without_where_rejected(triples):
    with pytest.raises(SparqlError, match="WHERE pattern"):
        make_query(triples, "DESCRIBE ?x")


def test_describe_unbound_var_rejected(triples):
    with pytest.raises(SparqlError, match="never bound"):
        _mq(triples, "DESCRIBE ?z WHERE { ?x e:knows ?y }")


def _mq(triples, src):
    return make_query(triples, f"PREFIX e: <{E}> {src}")


# ---------------------------------------------------------------------------
# round 4e: GRAPH (quad-store semantics over doc_iri)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def quads(spark):
    G1, G2 = E + "g1", E + "g2"
    rows = [
        (E + "a", E + "p", E + "b", False, None, G1),
        (E + "b", E + "p", E + "c", False, None, G2),
        (E + "a", E + "q", E + "d", False, None, G2),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_graph_constant_filters(quads):
    got = {
        tuple(r)
        for r in make_query(
            quads,
            f"PREFIX e: <{E}> SELECT ?s ?o WHERE {{ GRAPH <{E}g1> {{ ?s e:p ?o }} }}",
        ).collect()
    }
    assert got == {(E + "a", E + "b")}


def test_graph_variable_binds_doc(quads):
    got = {
        tuple(r)
        for r in make_query(
            quads,
            f"PREFIX e: <{E}> SELECT ?g ?s WHERE {{ GRAPH ?g {{ ?s e:p ?o }} }}",
        ).collect()
    }
    assert got == {(E + "g1", E + "a"), (E + "g2", E + "b")}


def test_graph_variable_joins_within_one_graph(quads):
    # both patterns inside GRAPH ?g must come from the SAME graph:
    # a-p-b and a-q-d live in different graphs, so no solution binds
    # them together
    got = make_query(
        quads,
        f"PREFIX e: <{E}> SELECT ?g ?s WHERE {{ GRAPH ?g {{ ?s e:p ?o . ?s e:q ?d }} }}",
    ).collect()
    assert got == []


def test_graph_mixes_with_default_patterns(quads):
    got = {
        tuple(r)
        for r in make_query(
            quads,
            f"PREFIX e: <{E}> SELECT ?g ?o WHERE "
            f"{{ ?a e:q ?d . GRAPH ?g {{ ?a e:p ?o }} }}",
        ).collect()
    }
    assert got == {(E + "g1", E + "b")}


def test_graph_var_path_is_graph_local(quads):
    # r6: p+ inside GRAPH ?g — the closure must NOT cross graphs:
    # a-p-b is in g1, b-p-c in g2, so a p+ c holds in NO single graph
    got = {
        tuple(r)
        for r in make_query(
            quads,
            f"PREFIX e: <{E}> SELECT ?g ?y WHERE {{ GRAPH ?g {{ e:a e:p+ ?y }} }}",
        ).collect()
    }
    assert got == {(E + "g1", E + "b")}


def test_graph_var_path_star_identity_per_graph(quads):
    # zero-length identity is relativized per graph: e:a matches
    # itself in EVERY graph (constant endpoint, §9.3), plus its p+
    # reachables within each graph
    got = {
        tuple(r)
        for r in make_query(
            quads,
            f"PREFIX e: <{E}> SELECT ?g ?y WHERE {{ GRAPH ?g {{ e:a e:p* ?y }} }}",
        ).collect()
    }
    assert got == {
        (E + "g1", E + "a"),
        (E + "g1", E + "b"),
        (E + "g2", E + "a"),
    }


def test_graph_var_path_joins_with_patterns(quads):
    # the ?g binding from the path joins with a plain pattern's graph
    # binding: only g2 has both a q-edge and b-p-c
    got = {
        tuple(r)
        for r in make_query(
            quads,
            f"PREFIX e: <{E}> SELECT ?g ?y ?d WHERE "
            f"{{ GRAPH ?g {{ e:b e:p+ ?y . e:a e:q ?d }} }}",
        ).collect()
    }
    assert got == {(E + "g2", E + "c", E + "d")}


def test_exists_scoped_to_active_graph(quads):
    # EXISTS inside GRAPH ?g must only see the active graph's triples:
    # a-p-b lives in g1 but a-q-d lives in g2, so EXISTS { ?s e:q ?d }
    # is false for (g1, a) — the unscoped (pre-r5) compile matched it
    # across all graphs
    got = make_query(
        quads,
        f"PREFIX e: <{E}> SELECT ?g ?s WHERE "
        f"{{ GRAPH ?g {{ ?s e:p ?o . FILTER EXISTS {{ ?s e:q ?d }} }} }}",
    ).collect()
    assert got == []


def test_not_exists_scoped_to_active_graph(quads):
    # the dual: NOT EXISTS keeps (g1, a) because g1 has no a-q-* triple
    got = {
        tuple(r)
        for r in make_query(
            quads,
            f"PREFIX e: <{E}> SELECT ?g ?s WHERE "
            f"{{ GRAPH ?g {{ ?s e:p ?o . FILTER NOT EXISTS {{ ?s e:q ?d }} }} }}",
        ).collect()
    }
    assert got == {(E + "g1", E + "a"), (E + "g2", E + "b")}


def test_graph_constant_path_allowed(quads):
    got = {
        r[0]
        for r in make_query(
            quads,
            f"PREFIX e: <{E}> SELECT ?y WHERE {{ GRAPH <{E}g1> {{ e:a e:p+ ?y }} }}",
        ).collect()
    }
    assert got == {E + "b"}  # closure confined to g1's edges


# ---------------------------------------------------------------------------
# round 4f: subqueries
# ---------------------------------------------------------------------------


def test_subquery_aggregate_join(triples):
    # classic shape: aggregate in the subquery, join with an outer
    # pattern on the shared variable
    got = {
        tuple(r)
        for r in _q(
            triples,
            "?p ?n WHERE { ?s ?p ?o . "
            "{ SELECT ?p (COUNT(?o2) AS ?n) WHERE { ?s2 ?p ?o2 } GROUP BY ?p } }",
        ).collect()
    }
    assert (E + "age", 3) in got and (E + "knows", 1) in got


def test_subquery_restricts_outer(triples):
    # subquery with LIMIT-by-order: only the most frequent predicate
    got = {
        r[0]
        for r in _q(
            triples,
            "?s WHERE { ?s ?p ?o . "
            "{ SELECT ?p (COUNT(?o2) AS ?n) WHERE { ?s2 ?p ?o2 } "
            "GROUP BY ?p ORDER BY DESC(?n) LIMIT 1 } }",
        ).collect()
    }
    assert got == {E + "a", E + "b", E + "c"}  # age holders


def test_subquery_plain_projection(triples):
    got = {
        r[0]
        for r in _q(
            triples,
            "?x WHERE { ?x e:age ?a . { SELECT ?x WHERE { ?x e:knows ?y } } }",
        ).collect()
    }
    assert got == {E + "a"}


def test_subquery_inherits_outer_prefixes(triples):
    # e: is declared only on the OUTER query
    got = {
        r[0]
        for r in _q(
            triples,
            "?x WHERE { { SELECT ?x WHERE { ?x e:knows ?y } } }",
        ).collect()
    }
    assert got == {E + "a"}


# ---------------------------------------------------------------------------
# round 4g: bound() / !bound() after OPTIONAL
# ---------------------------------------------------------------------------


def test_not_bound_after_optional(triples):
    got = {
        r[0]
        for r in _q(
            triples,
            "?x WHERE { ?x e:age ?a . OPTIONAL { ?x e:knows ?y } . FILTER(!bound(?y)) }",
        ).collect()
    }
    assert got == {E + "b", E + "c"}


def test_bound_after_optional(triples):
    got = {
        r[0]
        for r in _q(
            triples,
            "?x WHERE { ?x e:age ?a . OPTIONAL { ?x e:knows ?y } . FILTER(bound(?y)) }",
        ).collect()
    }
    assert got == {E + "a"}


def test_bang_negates_any_boolean(triples):
    # r5: `!` generalized from !bound-only to any boolean sub-expression
    got = {
        r[0]
        for r in _q(
            triples, "?x WHERE { ?x e:age ?a . FILTER(!regex(?a, \"3\")) }"
        ).collect()
    }
    # ages: a=30, b=7, c=45 — regex "3" matches only "30"
    assert got == {E + "b", E + "c"}


# ---------------------------------------------------------------------------
# round 5: FILTER expression functions — ||, IN, STR/LANG/DATATYPE,
# isIRI/isLiteral/isBlank, arithmetic operands
# ---------------------------------------------------------------------------

XSD = "http://www.w3.org/2001/XMLSchema#"


def test_filter_or(triples):
    got = {
        r[0]
        for r in _q(
            triples, "?x WHERE { ?x e:age ?a . FILTER(?a < 10 || ?a > 40) }"
        ).collect()
    }
    assert got == {E + "b", E + "c"}


def test_filter_or_and_precedence(triples):
    # && binds tighter than ||: (a<10) || (a>20 && a<40) → b and a
    got = {
        r[0]
        for r in _q(
            triples,
            "?x WHERE { ?x e:age ?a . FILTER(?a < 10 || ?a > 20 && ?a < 40) }",
        ).collect()
    }
    assert got == {E + "a", E + "b"}


def test_filter_parenthesized_boolean(triples):
    got = {
        r[0]
        for r in _q(
            triples,
            "?x WHERE { ?x e:age ?a . FILTER((?a < 10 || ?a > 40) && ?a != \"45\") }",
        ).collect()
    }
    assert got == {E + "b"}


def test_filter_in(triples):
    got = {
        r[0]
        for r in _q(
            triples, '?x WHERE { ?x e:age ?a . FILTER(?a IN ("7", "30")) }'
        ).collect()
    }
    assert got == {E + "a", E + "b"}


def test_filter_not_in(triples):
    got = {
        r[0]
        for r in _q(
            triples, '?x WHERE { ?x e:age ?a . FILTER(?a NOT IN ("7", "30")) }'
        ).collect()
    }
    assert got == {E + "c"}


def test_filter_in_iris(triples):
    got = {
        r[0]
        for r in _q(
            triples, "?x WHERE { ?x e:knows ?y . FILTER(?y IN (e:b, e:c)) }"
        ).collect()
    }
    assert got == {E + "a"}


def test_filter_str(triples):
    # STR() is the identity over our term representation — works on IRIs
    got = {
        r[0]
        for r in _q(
            triples, '?x WHERE { ?x e:knows ?y . FILTER(STR(?y) = "' + E + 'b") }'
        ).collect()
    }
    assert got == {E + "a"}


def test_filter_lang_empty(triples):
    # no language-tagged literals exist in this dialect: LANG() = ""
    got = {
        r[0]
        for r in _q(
            triples, '?x WHERE { ?x e:name ?n . FILTER(LANG(?n) = "") }'
        ).collect()
    }
    assert got == {E + "a"}


def test_filter_datatype_plain_literal_is_xsd_string(triples):
    got = {
        r[0]
        for r in _q(
            triples,
            f'?x WHERE {{ ?x e:name ?n . FILTER(DATATYPE(?n) = <{XSD}string>) }}',
        ).collect()
    }
    assert got == {E + "a"}


def test_filter_datatype_of_iri_is_type_error(triples):
    # DATATYPE of an IRI is a SPARQL type error: the row drops out
    got = _q(
        triples,
        f'?x WHERE {{ ?x e:knows ?y . FILTER(DATATYPE(?y) = <{XSD}string>) }}',
    ).collect()
    assert got == []


def test_filter_is_literal_and_is_iri(triples):
    lits = {
        tuple(r)
        for r in _q(
            triples, "?x ?o WHERE { ?x e:age ?o . FILTER(isLiteral(?o)) }"
        ).collect()
    }
    assert len(lits) == 3
    iris = {
        r[0]
        for r in _q(triples, "?y WHERE { ?x e:knows ?y . FILTER(isIRI(?y)) }").collect()
    }
    assert iris == {E + "b"}
    none = _q(triples, "?o WHERE { ?x e:age ?o . FILTER(isIRI(?o)) }").collect()
    assert none == []


def test_filter_unparenthesized_builtin(triples):
    got = {
        r[0]
        for r in _q(
            triples, '?x WHERE { ?x e:name ?n . FILTER regex(?n, "^ali") }'
        ).collect()
    }
    assert got == {E + "a"}


def test_filter_arithmetic_operand(triples):
    got = {
        r[0]
        for r in _q(
            triples, "?x WHERE { ?x e:age ?a . FILTER(?a * 2 > 80) }"
        ).collect()
    }
    assert got == {E + "c"}


def test_filter_arithmetic_parenthesized_lhs(triples):
    got = {
        r[0]
        for r in _q(
            triples, "?x WHERE { ?x e:age ?a . FILTER((?a + 5) / 2 > 20) }"
        ).collect()
    }
    assert got == {E + "c"}


def test_filter_string_functions(triples):
    got = {
        r[0]
        for r in _q(
            triples, '?x WHERE { ?x e:name ?n . FILTER(STRSTARTS(?n, "ali")) }'
        ).collect()
    }
    assert got == {E + "a"}
    got = {
        r[0]
        for r in _q(
            triples, '?x WHERE { ?x e:name ?n . FILTER(STRENDS(?n, "ice")) }'
        ).collect()
    }
    assert got == {E + "a"}
    got = {
        r[0]
        for r in _q(
            triples, '?x WHERE { ?x e:name ?n . FILTER(CONTAINS(?n, "lic")) }'
        ).collect()
    }
    assert got == {E + "a"}
    # no match
    got = _q(
        triples, '?x WHERE { ?x e:name ?n . FILTER(CONTAINS(?n, "zzz")) }'
    ).collect()
    assert got == []


def test_filter_strlen_ucase_lcase(triples):
    got = {
        r[0]
        for r in _q(
            triples, "?x WHERE { ?x e:name ?n . FILTER(STRLEN(?n) = 5) }"
        ).collect()
    }
    assert got == {E + "a"}
    got = {
        r[0]
        for r in _q(
            triples, '?x WHERE { ?x e:name ?n . FILTER(UCASE(?n) = "ALICE") }'
        ).collect()
    }
    assert got == {E + "a"}
    got = {
        r[0]
        for r in _q(
            triples, '?x WHERE { ?x e:name ?n . FILTER(LCASE(?n) = "alice") }'
        ).collect()
    }
    assert got == {E + "a"}


def test_filter_sameterm(triples):
    got = {
        r[0]
        for r in _q(
            triples,
            "?x WHERE { ?x e:knows ?y . ?z e:likes ?w . FILTER(sameTerm(?y, ?z)) }",
        ).collect()
    }
    # a knows b; b likes c — sameTerm(?y,?z) keeps the b-b pairing
    assert got == {E + "a"}
    neg = _q(
        triples,
        '?x WHERE { ?x e:name ?n . FILTER(sameTerm(?n, "bob")) }',
    ).collect()
    assert neg == []


def test_filter_metadata_needs_object_binding(triples):
    with pytest.raises(SparqlError, match="object position"):
        _q(triples, "?x WHERE { ?x e:age ?a . FILTER(isLiteral(?x)) }")


def test_filter_metadata_not_a_join_key(triples):
    # the same variable bound in two object positions must still join
    # on the term alone — companion metadata stays off the join keys
    got = {
        r[0]
        for r in _q(
            triples,
            "?y WHERE { e:a e:knows ?y . ?b e:likes ?c . "
            "FILTER(isIRI(?y) && isIRI(?c)) }",
        ).collect()
    }
    assert got == {E + "b"}


# ---------------------------------------------------------------------------
# r6: value expressions in SELECT, GROUP_CONCAT/SAMPLE, negated
# property sets
# ---------------------------------------------------------------------------


def test_select_expression_plain(triples):
    rows = {
        tuple(r)
        for r in _q(
            triples,
            '?x (CONCAT(?n, "!") AS ?shout) WHERE { ?x e:name ?n }',
        ).collect()
    }
    assert rows == {(E + "a", "alice!")}


def test_select_expression_arithmetic(triples):
    rows = {
        (r[0], r[1])
        for r in _q(
            triples, "?x (?a * 2 AS ?double_age) WHERE { ?x e:age ?a }"
        ).collect()
    }
    assert rows == {(E + "a", 60.0), (E + "b", 14.0), (E + "c", 90.0)}


def test_select_expression_chains_aliases(triples):
    # a later expression may reference an earlier alias
    rows = {
        (r[0], r[1], r[2])
        for r in _q(
            triples,
            "?x (?a + 1 AS ?b1) (?b1 * 10 AS ?b10) WHERE { ?x e:age ?a }",
        ).collect()
    }
    assert (E + "b", 8.0, 80.0) in rows


def test_select_expression_post_aggregation(triples):
    rows = {
        (r[0], r[1])
        for r in _q(
            triples,
            "?x (COUNT(?p) AS ?n) (?n * 100 AS ?pct) WHERE { ?x ?p ?o } GROUP BY ?x",
        ).collect()
    }
    # a has age+knows+name = 3 patterns
    assert (E + "a", 300.0) in {(r[0], r[2]) for r in _q(
        triples,
        "?x (COUNT(?p) AS ?n) (?n * 100 AS ?pct) WHERE { ?x ?p ?o } GROUP BY ?x",
    ).collect()}


def test_select_expression_alias_collision_rejected(triples):
    with pytest.raises(SparqlError, match="already bound"):
        _q(triples, "?x (?a * 2 AS ?a) WHERE { ?x e:age ?a }")


def test_select_expression_without_as_rejected(triples):
    with pytest.raises(SparqlError, match="AS"):
        _q(triples, "?x (?a * 2) WHERE { ?x e:age ?a }")


def test_group_concat(triples):
    rows = {
        tuple(r)
        for r in _q(
            triples,
            '(GROUP_CONCAT(?n; SEPARATOR=",") AS ?all) WHERE { ?x e:age ?n }',
        ).collect()
    }
    # deterministic dialect: sorted lexical order
    assert rows == {("30,45,7",)}


def test_group_concat_default_separator_and_groups(triples):
    rows = {
        tuple(r)
        for r in _q(
            triples,
            "?x (GROUP_CONCAT(?o) AS ?vals) WHERE { ?x e:knows ?o } GROUP BY ?x",
        ).collect()
    }
    assert rows == {(E + "a", E + "b")}


def test_group_concat_distinct(spark):
    rows_in = [
        (E + "a", E + "tag", "x", True, None, E),
        (E + "a", E + "tag", "x", True, None, E),
        (E + "a", E + "tag", "y", True, None, E),
    ]
    tdf = spark.createDataFrame(rows_in, SCHEMA)
    got = make_query(
        tdf,
        f"PREFIX e: <{E}> SELECT ?s (GROUP_CONCAT(DISTINCT ?t) AS ?ts) "
        f"WHERE {{ ?s e:tag ?t }} GROUP BY ?s",
    ).collect()
    assert [(r[0], r[1]) for r in got] == [(E + "a", "x y")]


def test_sample_aggregate(triples):
    rows = {
        tuple(r)
        for r in _q(
            triples, "(SAMPLE(?n) AS ?one) WHERE { ?x e:age ?n }"
        ).collect()
    }
    # deterministic dialect: SAMPLE = min
    assert rows == {("30",)}


def test_negated_property_set_single(triples):
    got = {
        tuple(r)
        for r in _q(triples, "?s ?o WHERE { ?s !e:age ?o }").collect()
    }
    assert got == {(E + "a", E + "b"), (E + "b", E + "c"), (E + "a", "alice")}


def test_negated_property_set_multi(triples):
    got = {
        tuple(r)
        for r in _q(
            triples, "?s ?o WHERE { ?s !(e:age|e:name) ?o }"
        ).collect()
    }
    assert got == {(E + "a", E + "b"), (E + "b", E + "c")}


def test_negated_property_set_in_sequence(triples):
    # a !(...)/p sequence composes with plain segments
    got = {
        r[0]
        for r in _q(
            triples, "?s WHERE { ?s !(e:age|e:name)/e:likes ?o }"
        ).collect()
    }
    assert got == {E + "a"}


def test_negated_property_set_inverse_only(triples):
    # r6b: `!(^p)` is reverse-only — (x,y) with some (y,q,x), q ∉ {p};
    # the forward half has no members and contributes NOTHING
    got = {
        tuple(r)
        for r in _q(triples, "?s ?o WHERE { ?s !(^e:age) ?o }").collect()
    }
    assert got == {(E + "b", E + "a"), (E + "c", E + "b"), ("alice", E + "a")}


def test_negated_property_set_mixed_directions(triples):
    # forward half negates the forward members, inverse half the ^
    # members; the two filtered scans union (SPARQL 1.1 §9.1)
    got = {
        tuple(r)
        for r in _q(
            triples,
            "?s ?o WHERE { ?s !(e:age|e:name|^e:age|^e:name) ?o }",
        ).collect()
    }
    assert got == {
        (E + "a", E + "b"), (E + "b", E + "c"),  # forward knows/likes
        (E + "b", E + "a"), (E + "c", E + "b"),  # reversed knows/likes
    }


def test_negated_property_set_variable_rejected(triples):
    with pytest.raises(SparqlError, match="concrete"):
        _q(triples, "?s ?o WHERE { ?s !?p ?o }")


def test_filter_in_variable_rejected(triples):
    with pytest.raises(SparqlError, match="IN list members must be constant"):
        _q(triples, "?x WHERE { ?x e:age ?a . FILTER(?a IN (?x)) }")


def test_sameterm_no_numeric_coercion(spark):
    rows_in = [
        (E + "a", E + "v", "30", True, None, E),
        (E + "b", E + "v", "30.0", True, None, E),
    ]
    tdf = spark.createDataFrame(rows_in, SCHEMA)
    got = {
        r[0]
        for r in make_query(
            tdf,
            f"PREFIX e: <{E}> SELECT ?x WHERE "
            f"{{ ?x e:v ?v . FILTER(sameTerm(?v, 30)) }}",
        ).collect()
    }
    # lexical comparison: "30.0" is NOT the same term as 30
    assert got == {E + "a"}


def test_bind_full_expression_grammar(triples):
    # BIND routes through the r6 operand grammar: functions compose
    got = {
        (r[0], r[1])
        for r in _q(
            triples,
            '?x ?t WHERE { ?x e:name ?n . '
            'BIND(CONCAT(UCASE(SUBSTR(?n, 1, 1)), SUBSTR(?n, 2)) AS ?t) }',
        ).collect()
    }
    assert got == {(E + "a", "Alice")}


def test_bind_coalesce_over_optional(triples):
    got = {
        (r[0], r[1])
        for r in _q(
            triples,
            '?x ?who WHERE { ?x e:age ?a . OPTIONAL { ?x e:knows ?y } . '
            'BIND(COALESCE(?y, "nobody") AS ?who) }',
        ).collect()
    }
    assert got == {
        (E + "a", E + "b"),
        (E + "b", "nobody"),
        (E + "c", "nobody"),
    }


def test_bind_bare_number_binds_lexical_form(triples):
    got = {
        (r[0], r[1])
        for r in _q(
            triples, '?x ?k WHERE { ?x e:name ?n . BIND(5 AS ?k) }'
        ).collect()
    }
    assert got == {(E + "a", "5")}


def test_select_star(triples):
    rows = {
        tuple(r)
        for r in _q(
            triples, "* WHERE { ?x e:age ?a . OPTIONAL { ?x e:knows ?y } }"
        ).collect()
    }
    assert rows == {
        (E + "a", "30", E + "b"),
        (E + "b", "7", None),
        (E + "c", "45", None),
    }


def test_subquery_under_graph_var_per_graph_agg(quads):
    # r6: { GRAPH ?g { { SELECT (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } } } }
    # — the subquery aggregates PER GRAPH and binds ?g
    got = {
        tuple(r)
        for r in make_query(
            quads,
            f"PREFIX e: <{E}> SELECT ?g ?n WHERE "
            f"{{ GRAPH ?g {{ {{ SELECT (COUNT(?o) AS ?n) WHERE {{ ?s ?p ?o }} }} }} }}",
        ).collect()
    }
    assert got == {(E + "g1", 1), (E + "g2", 2)}


def test_subquery_under_graph_var_joins_outer(quads):
    # the subquery's bindings join the outer pattern WITHIN each graph:
    # only g2 has both a q-edge and the subquery's p-subject b
    got = {
        tuple(r)
        for r in make_query(
            quads,
            f"PREFIX e: <{E}> SELECT ?g ?s ?d WHERE {{ GRAPH ?g {{ "
            f"?a e:q ?d . {{ SELECT ?s WHERE {{ ?s e:p ?o }} }} }} }}",
        ).collect()
    }
    assert got == {(E + "g2", E + "b", E + "d")}


def test_subquery_under_graph_var_limit_rejected(quads):
    with pytest.raises(SparqlError, match="LIMIT/OFFSET in a subquery under GRAPH"):
        make_query(
            quads,
            f"PREFIX e: <{E}> SELECT ?g ?s WHERE {{ GRAPH ?g {{ "
            f"{{ SELECT ?s WHERE {{ ?s e:p ?o }} LIMIT 1 }} }} }}",
        )


def test_values_undef_single_var(triples):
    # UNDEF row keeps every solution; the defined row constrains
    got = {
        (r[0], r[1])
        for r in _q(
            triples,
            "?x ?n WHERE { ?x e:age ?n . VALUES ?x { e:a UNDEF } }",
        ).collect()
    }
    # e:a matches twice (its own row + the UNDEF row) but set
    # semantics dedup; UNDEF keeps b and c too
    assert got == {(E + "a", "30"), (E + "b", "7"), (E + "c", "45")}


def test_values_undef_tuple_mixed_masks(triples):
    # (e:a UNDEF): constrains ?x only; (UNDEF "7"): constrains ?n only
    got = {
        (r[0], r[1])
        for r in _q(
            triples,
            '?x ?n WHERE { ?x e:age ?n . '
            'VALUES (?x ?n) { (e:a UNDEF) (UNDEF "7") } }',
        ).collect()
    }
    assert got == {(E + "a", "30"), (E + "b", "7")}


def test_values_undef_standalone_is_null(triples):
    got = {
        tuple(r)
        for r in _q(
            triples, "?x ?y WHERE { VALUES (?x ?y) { (e:a UNDEF) } }"
        ).collect()
    }
    assert got == {(E + "a", None)}


def test_values_undef_new_var_cross_joins(triples):
    # a row defining only a NEW variable joins every outer solution
    got = {
        (r[0], r[1])
        for r in _q(
            triples,
            "?x ?tag WHERE { ?x e:name ?n . "
            'VALUES (?n ?tag) { (UNDEF "t1") } }',
        ).collect()
    }
    assert got == {(E + "a", "t1")}


# --- r6 second value-expression batch: STRBEFORE/STRAFTER edge
# cases, dateTime accessors, isNumeric, langMatches, digests ---


@pytest.fixture(scope="module")
def dt_triples(spark):
    rows = [
        (E + "a", E + "at", "2024-03-15T10:30:45", True,
         "http://www.w3.org/2001/XMLSchema#dateTime", E),
        (E + "b", E + "at", "not-a-date", True, None, E),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_strbefore_empty_separator_is_empty(triples):
    # SPARQL 17.4.3.4: STRBEFORE("alice", "") = "" (match at position 1)
    got = {
        (r[0], r[1])
        for r in _q(
            triples,
            '?x ?t WHERE { ?x e:name ?n . BIND(STRBEFORE(?n, "") AS ?t) }',
        ).collect()
    }
    assert got == {(E + "a", "")}


def test_strafter_empty_separator_is_whole_string(triples):
    # SPARQL 17.4.3.5: STRAFTER("alice", "") = "alice"
    got = {
        (r[0], r[1])
        for r in _q(
            triples,
            '?x ?t WHERE { ?x e:name ?n . BIND(STRAFTER(?n, "") AS ?t) }',
        ).collect()
    }
    assert got == {(E + "a", "alice")}


def test_strbefore_strafter_absent_separator(triples):
    got = {
        tuple(r)
        for r in _q(
            triples,
            '?x ?b ?a WHERE { ?x e:name ?n . '
            'BIND(STRBEFORE(?n, "zz") AS ?b) . '
            'BIND(STRAFTER(?n, "zz") AS ?a) }',
        ).collect()
    }
    assert got == {(E + "a", "", "")}


def test_strbefore_first_occurrence(triples):
    # "alice" → before first "i" is "al", after is "ce"
    got = {
        tuple(r)
        for r in _q(
            triples,
            '?b ?a WHERE { ?x e:name ?n . '
            'BIND(STRBEFORE(?n, "i") AS ?b) . '
            'BIND(STRAFTER(?n, "i") AS ?a) }',
        ).collect()
    }
    assert got == {("al", "ce")}


def test_datetime_accessors(dt_triples):
    got = {
        tuple(r)
        for r in make_query(
            dt_triples,
            f"PREFIX e: <{E}> SELECT ?y ?mo ?d ?h ?mi ?s WHERE "
            f"{{ ?x e:at ?t . FILTER(YEAR(?t) = 2024) . "
            f"BIND(YEAR(?t) AS ?y) . BIND(MONTH(?t) AS ?mo) . "
            f"BIND(DAY(?t) AS ?d) . BIND(HOURS(?t) AS ?h) . "
            f"BIND(MINUTES(?t) AS ?mi) . BIND(SECONDS(?t) AS ?s) }}",
        ).collect()
    }
    # SECONDS is double (xsd:decimal); the rest are SPARQL integers
    assert got == {(2024, 3, 15, 10, 30, 45.0)}


def test_datetime_accessor_non_datetime_drops_row(dt_triples):
    # a non-dateTime lexical form is a type error → filter drops the row
    got = {
        r[0]
        for r in make_query(
            dt_triples,
            f"PREFIX e: <{E}> SELECT ?x WHERE "
            f"{{ ?x e:at ?t . FILTER(MONTH(?t) >= 1) }}",
        ).collect()
    }
    assert got == {E + "a"}


def test_is_numeric(triples):
    got = {
        r[0]
        for r in _q(
            triples, "?x WHERE { ?x ?p ?v . FILTER(isNumeric(?v)) }"
        ).collect()
    }
    # ages "30"/"7"/"45" are numeric; "alice" and the IRI objects are not
    assert got == {E + "a", E + "b", E + "c"}


def test_is_numeric_negated_keeps_iris_and_strings(triples):
    got = {
        (r[0], r[1])
        for r in _q(
            triples, "?x ?v WHERE { ?x ?p ?v . FILTER(!isNumeric(?v)) }"
        ).collect()
    }
    assert got == {
        (E + "a", E + "b"),
        (E + "b", E + "c"),
        (E + "a", "alice"),
    }


def test_langmatches_basic_filtering(triples):
    # bind an explicit tag: "en-us" matches range "en" (subtag prefix)
    got = {
        r[0]
        for r in _q(
            triples,
            '?x WHERE { ?x e:name ?n . BIND("en-US" AS ?t) . '
            'FILTER(langMatches(?t, "en")) }',
        ).collect()
    }
    assert got == {E + "a"}


def test_langmatches_no_false_prefix(triples):
    # range "en" must NOT match tag "enx" (boundary is "-")
    got = {
        r[0]
        for r in _q(
            triples,
            '?x WHERE { ?x e:name ?n . BIND("enx" AS ?t) . '
            'FILTER(langMatches(?t, "en")) }',
        ).collect()
    }
    assert got == set()


def test_langmatches_star_requires_nonempty(triples):
    got = {
        r[0]
        for r in _q(
            triples,
            '?x WHERE { ?x e:name ?n . BIND(LANG(?n) AS ?t) . '
            'FILTER(langMatches(?t, "*")) }',
        ).collect()
    }
    assert got == set()


def test_digest_of_iri_lexical_form(triples):
    import hashlib

    want = hashlib.sha256((E + "b").encode()).hexdigest()
    got = {
        (r[0], r[1])
        for r in _q(
            triples,
            "?x ?h WHERE { ?x e:knows ?y . BIND(SHA256(?y) AS ?h) }",
        ).collect()
    }
    assert got == {(E + "a", want)}


def test_sum_avg_distinct(spark):
    rows_in = [
        (E + "a", E + "n", "10", True, None, E),
        (E + "a", E + "n", "10", True, None, E),
        (E + "a", E + "n", "30", True, None, E),
    ]
    tdf = spark.createDataFrame(rows_in, SCHEMA)
    got = make_query(
        tdf,
        f"PREFIX e: <{E}> SELECT ?s (SUM(DISTINCT ?n) AS ?sd) "
        f"(AVG(DISTINCT ?n) AS ?ad) (SUM(?n) AS ?sa) "
        f"WHERE {{ ?s e:n ?n }} GROUP BY ?s",
    ).collect()
    assert [(r[0], r[1], r[2], r[3]) for r in got] == [
        (E + "a", 40.0, 20.0, 50.0)
    ]


def test_encode_for_uri(spark):
    # spec example chars: space→%20, '~' kept, '*' encoded, unicode UTF-8
    rows_in = [(E + "a", E + "v", "Les Mis~*é", True, None, E)]
    tdf = spark.createDataFrame(rows_in, SCHEMA)
    got = make_query(
        tdf,
        f"PREFIX e: <{E}> SELECT ?t WHERE {{ ?x e:v ?v . "
        f"BIND(ENCODE_FOR_URI(?v) AS ?t) }}",
    ).collect()
    assert got[0][0] == "Les%20Mis~%2A%C3%A9"


def test_tz_accessor(spark):
    rows_in = [
        (E + "a", E + "at", "2024-03-15T10:30:45Z", True, None, E),
        (E + "b", E + "at", "2024-03-15T10:30:45+05:00", True, None, E),
        (E + "c", E + "at", "2024-03-15T10:30:45", True, None, E),
    ]
    tdf = spark.createDataFrame(rows_in, SCHEMA)
    got = {
        (r[0], r[1])
        for r in make_query(
            tdf,
            f"PREFIX e: <{E}> SELECT ?x ?z WHERE {{ ?x e:at ?t . "
            f"BIND(TZ(?t) AS ?z) }}",
        ).collect()
    }
    assert got == {(E + "a", "Z"), (E + "b", "+05:00"), (E + "c", "")}


def test_iri_constructor_pass_through(triples):
    got = {
        (r[0], r[1])
        for r in _q(
            triples,
            '?x ?u WHERE { ?x e:name ?n . '
            'BIND(IRI(CONCAT("http://ex.org/", ?n)) AS ?u) }',
        ).collect()
    }
    assert got == {(E + "a", E + "alice")}


def test_now_constant_and_datetime_shaped(triples):
    rows = make_query(
        triples.sparkSession.createDataFrame(
            [(E + "a", E + "p", "1", True, None, E),
             (E + "b", E + "p", "2", True, None, E)],
            SCHEMA,
        ),
        f"PREFIX e: <{E}> SELECT ?x ?t ?y WHERE {{ ?x e:p ?v . "
        f"BIND(NOW() AS ?t) . BIND(YEAR(?t) AS ?y) }}",
    ).collect()
    # same instant for every row of the query; lexical form parses
    assert len({r[1] for r in rows}) == 1
    assert all(r[2] >= 2026 for r in rows)


def test_timezone_duration_accessor(spark):
    # 17.4.5.7: the offset as an xsd:dayTimeDuration lexical form;
    # NULL (type error — BIND leaves the var NULL) when absent
    rows_in = [
        (E + "a", E + "at", "2024-03-15T10:30:45Z", True, None, E),
        (E + "b", E + "at", "2024-03-15T10:30:45-05:00", True, None, E),
        (E + "c", E + "at", "2024-03-15T10:30:45+05:30", True, None, E),
        (E + "d", E + "at", "2024-03-15T10:30:45+00:00", True, None, E),
        (E + "e", E + "at", "2024-03-15T10:30:45", True, None, E),
    ]
    tdf = spark.createDataFrame(rows_in, SCHEMA)
    got = {
        (r[0], r[1])
        for r in make_query(
            tdf,
            f"PREFIX e: <{E}> SELECT ?x ?z WHERE {{ ?x e:at ?t . "
            f"BIND(TIMEZONE(?t) AS ?z) }}",
        ).collect()
    }
    assert got == {
        (E + "a", "PT0S"),
        (E + "b", "-PT5H"),
        (E + "c", "PT5H30M"),
        (E + "d", "PT0S"),
        (E + "e", None),
    }


def test_strlang_strdt_lexical_dialect(triples):
    # dialect: both constructors yield the lexical form of arg1 (no
    # language/datatype channel on BIND results); malformed second
    # arguments raise at parse time
    got = {
        (r[0], r[1])
        for r in _q(
            triples,
            '?x ?l WHERE { ?x e:name ?n . BIND(STRLANG(?n, "en") AS ?l) }',
        ).collect()
    }
    assert got == {(E + "a", "alice")}
    got = {
        (r[0], r[1])
        for r in _q(
            triples,
            "?x ?l WHERE { ?x e:name ?n . BIND(STRDT(?n, "
            "<http://www.w3.org/2001/XMLSchema#string>) AS ?l) }",
        ).collect()
    }
    assert got == {(E + "a", "alice")}
    with pytest.raises(SparqlError, match="STRLANG"):
        _q(triples, '?x WHERE { ?x e:name ?n . BIND(STRLANG(?n, ?n) AS ?l) }')
    with pytest.raises(SparqlError, match="STRDT"):
        _q(triples, '?x WHERE { ?x e:name ?n . BIND(STRDT(?n, "x") AS ?l) }')


def test_rand_uuid_struuid_bnode_shapes(spark):
    rows_in = [
        (E + "a", E + "p", "1", True, None, E),
        (E + "b", E + "p", "2", True, None, E),
    ]
    tdf = spark.createDataFrame(rows_in, SCHEMA)
    rows = make_query(
        tdf,
        f"PREFIX e: <{E}> SELECT ?x ?r ?u ?s ?bn WHERE {{ ?x e:p ?v . "
        f"BIND(RAND() AS ?r) . BIND(UUID() AS ?u) . "
        f"BIND(STRUUID() AS ?s) . BIND(BNODE() AS ?bn) . "
        f"FILTER(RAND() >= 0) }}",
    ).collect()
    assert len(rows) == 2
    import re as _re

    uuid_re = _re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"
    )
    for r in rows:
        assert 0.0 <= r["r"] < 1.0
        assert r["u"].startswith("urn:uuid:") and uuid_re.match(
            r["u"][len("urn:uuid:"):]
        )
        assert uuid_re.match(r["s"])
        assert r["bn"].startswith("_:b")
    # fresh per solution: distinct across the two rows
    assert rows[0]["u"] != rows[1]["u"]
    assert rows[0]["bn"] != rows[1]["bn"]
    # BNODE(str) needs per-label identity the engine does not track
    with pytest.raises(SparqlError, match="BNODE"):
        make_query(
            tdf,
            f'PREFIX e: <{E}> SELECT ?x WHERE {{ ?x e:p ?v . '
            f'BIND(BNODE("k") AS ?bn) }}',
        )


# ---------------------------------------------------------------------------
# r6c: FROM / FROM NAMED dataset clauses (SPARQL 1.1 section 13.2)
# ---------------------------------------------------------------------------


def test_from_restricts_default_graph(quads):
    got = {
        tuple(r)
        for r in make_query(
            quads,
            f"PREFIX e: <{E}> SELECT ?s ?o FROM <{E}g1> WHERE {{ ?s e:p ?o }}",
        ).collect()
    }
    assert got == {(E + "a", E + "b")}


def test_from_merges_multiple_graphs(quads):
    got = {
        tuple(r)
        for r in make_query(
            quads,
            f"PREFIX e: <{E}> SELECT ?s ?o FROM <{E}g1> FROM <{E}g2> "
            "WHERE { ?s e:p ?o }",
        ).collect()
    }
    assert got == {(E + "a", E + "b"), (E + "b", E + "c")}


def test_from_named_scopes_graph_var(quads):
    # GRAPH ranges over the FROM NAMED set only
    got = {
        tuple(r)
        for r in make_query(
            quads,
            f"PREFIX e: <{E}> SELECT ?g ?s FROM NAMED <{E}g2> "
            "WHERE { GRAPH ?g { ?s e:p ?o } }",
        ).collect()
    }
    assert got == {(E + "g2", E + "b")}


def test_from_only_empties_graph(quads):
    # a dataset with FROM but no FROM NAMED has no named graphs
    got = make_query(
        quads,
        f"PREFIX e: <{E}> SELECT ?g FROM <{E}g1> "
        "WHERE { GRAPH ?g { ?s e:p ?o } }",
    ).collect()
    assert got == []


def test_from_named_only_empties_default(quads):
    # a dataset with only FROM NAMED has an EMPTY default graph
    got = make_query(
        quads,
        f"PREFIX e: <{E}> SELECT ?s FROM NAMED <{E}g1> WHERE {{ ?s e:p ?o }}",
    ).collect()
    assert got == []


def test_from_with_prefixed_name(quads):
    got = {
        r[0]
        for r in make_query(
            quads,
            f"PREFIX e: <{E}> SELECT ?s FROM e:g2 WHERE {{ ?s e:p ?o }}",
        ).collect()
    }
    assert got == {E + "b"}


def test_from_inside_body_string_is_not_a_dataset_clause(quads):
    # only pre-brace text is scanned: FROM inside a literal stays put
    got = make_query(
        quads,
        f'PREFIX e: <{E}> SELECT ?s WHERE {{ ?s e:p ?o . '
        f'FILTER(!CONTAINS(STR(?s), "FROM <x>")) }}',
    ).collect()
    assert len(got) == 2


def test_from_applies_to_ask_and_construct(quads):
    row = make_query(
        quads, f"PREFIX e: <{E}> ASK FROM <{E}g1> {{ ?s e:q ?o }}"
    ).collect()[0]
    assert row["ask"] is False  # e:q lives in g2 only
    rows = make_query(
        quads,
        f"PREFIX e: <{E}> CONSTRUCT {{ ?s e:r ?o }} FROM <{E}g2> "
        "WHERE { ?s e:p ?o }",
    ).collect()
    assert {(r["subj"], r["obj"]) for r in rows} == {(E + "b", E + "c")}


def test_select_distinct_and_reduced_keywords(triples):
    """DISTINCT and REDUCED both parse; results are set-semantic either
    way (exactly DISTINCT; a permitted REDUCED answer per §15.3.2)."""
    plain = {r["x"] for r in _q(triples, "?x WHERE { ?x e:age ?a }").collect()}
    dist = {
        r["x"]
        for r in _q(triples, "DISTINCT ?x WHERE { ?x e:age ?a }").collect()
    }
    red = {
        r["x"]
        for r in _q(triples, "REDUCED ?x WHERE { ?x e:age ?a }").collect()
    }
    assert plain == dist == red and len(plain) == 3


def test_construct_where_shorthand(triples):
    """§10.2.3: `CONSTRUCT WHERE { BGP }` uses the pattern as its own
    template; equals the explicit long form. Non-BGP patterns raise."""
    from yamlpyowl_spark.operators.sparql import make_query

    short = {
        tuple(r)
        for r in make_query(
            triples, f"PREFIX e: <{E}> CONSTRUCT WHERE {{ ?x e:age ?a }}"
        ).collect()
    }
    long = {
        tuple(r)
        for r in make_query(
            triples,
            f"PREFIX e: <{E}> CONSTRUCT {{ ?x e:age ?a }} "
            "WHERE { ?x e:age ?a }",
        ).collect()
    }
    assert short == long and len(short) == 3
    with pytest.raises(SparqlError, match="BGP"):
        make_query(
            triples,
            f"PREFIX e: <{E}> CONSTRUCT WHERE "
            "{ ?x e:age ?a . FILTER(?a > 10) }",
        )


def test_having_boolean_combinations(triples):
    """r6d: HAVING takes && / || / ! combinations of aggregate and
    alias comparisons, standard precedence, same single groupBy."""
    # age: a=30, b?, c? — sum 82 over 3 subjects; predicate counts:
    # age ×3, knows ×1, likes ×1, name ×1
    both = {
        r["p"]
        for r in _q(
            triples,
            "?p (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p "
            "HAVING (?n > 2 && COUNT(?o) < 5)",
        ).collect()
    }
    assert both == {E + "age"}
    either = {
        r["p"]
        for r in _q(
            triples,
            "?p (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p "
            "HAVING (?n > 2 || ?n = 1)",
        ).collect()
    }
    assert either == {E + "age", E + "knows", E + "likes", E + "name"}
    negated = {
        r["p"]
        for r in _q(
            triples,
            "?p (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p "
            "HAVING (!(?n > 2))",
        ).collect()
    }
    assert negated == {E + "knows", E + "likes", E + "name"}
    # parens override &&-over-|| precedence
    grouped = {
        r["p"]
        for r in _q(
            triples,
            "?p (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p "
            "HAVING ((?n = 1 || ?n = 3) && ?n != 1)",
        ).collect()
    }
    assert grouped == {E + "age"}
    with pytest.raises(SparqlError, match="HAVING"):
        _q(
            triples,
            "?p (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p "
            "HAVING (?n > 2 &&)",
        )


def test_final_values_clause(triples):
    """§18.2.4.3 (r6d): a query-level trailing VALUES joins the
    solutions — after grouping for aggregate queries (so it can
    constrain group keys and aliases), before projection/ORDER."""
    from yamlpyowl_spark.operators.sparql import make_query

    got = {
        r["x"]
        for r in make_query(
            triples,
            f"PREFIX e: <{E}> SELECT ?x ?a WHERE {{ ?x e:age ?a }} "
            f'VALUES ?x {{ <{E}a> <{E}b> }}',
        ).collect()
    }
    assert got == {E + "a", E + "b"}
    # constrain an aggregate alias (numeric column: inline side casts)
    rows = make_query(
        triples,
        f"PREFIX e: <{E}> SELECT ?p (COUNT(?o) AS ?n) "
        "WHERE { ?s ?p ?o } GROUP BY ?p "
        'VALUES ?n { "3" }',
    ).collect()
    assert {(r["p"], r["n"]) for r in rows} == {(E + "age", 3)}
    # an in-group VALUES at the end of WHERE still parses as in-group
    got2 = {
        r["x"]
        for r in make_query(
            triples,
            f"PREFIX e: <{E}> SELECT ?x WHERE {{ ?x e:age ?a . "
            f"VALUES ?x {{ <{E}a> }} }}",
        ).collect()
    }
    assert got2 == {E + "a"}


def test_subquery_under_graph_var_per_graph_topk(quads):
    """r6d: LIMIT/OFFSET in a subquery under GRAPH ?g slices WITHIN
    each graph (row_number window partitioned by the graph column);
    ORDER BY is required for determinism."""
    # per graph, the lexically-first p-subject: g1 → a, g2 → b
    got = {
        tuple(r)
        for r in make_query(
            quads,
            f"PREFIX e: <{E}> SELECT ?g ?s WHERE {{ GRAPH ?g {{ "
            f"{{ SELECT ?s WHERE {{ ?s e:p ?o }} ORDER BY ?s LIMIT 1 }} "
            f"}} }}",
        ).collect()
    }
    assert got == {(E + "g1", E + "a"), (E + "g2", E + "b")}
    # OFFSET past every row in a graph leaves that graph empty
    got2 = {
        tuple(r)
        for r in make_query(
            quads,
            f"PREFIX e: <{E}> SELECT ?g ?s WHERE {{ GRAPH ?g {{ "
            f"{{ SELECT ?s WHERE {{ ?s e:p ?o }} ORDER BY ?s OFFSET 1 }} "
            f"}} }}",
        ).collect()
    }
    assert got2 == set()


def test_final_values_on_ask_and_construct(quads):
    """r6d: the trailing VALUES clause also applies to ASK / CONSTRUCT
    (relocated into the WHERE group — those forms have no grouping
    stage, so the join point is equivalent)."""
    [r] = make_query(
        quads,
        f"PREFIX e: <{E}> ASK {{ ?s e:p ?o }} VALUES ?s {{ <{E}a> }}",
    ).collect()
    assert r["ask"] is True
    [r] = make_query(
        quads,
        f"PREFIX e: <{E}> ASK {{ ?s e:p ?o }} VALUES ?s {{ <{E}zzz> }}",
    ).collect()
    assert r["ask"] is False
    got = {
        tuple(r)
        for r in make_query(
            quads,
            f"PREFIX e: <{E}> CONSTRUCT {{ ?s e:r ?o }} "
            f"WHERE {{ ?s e:p ?o }} VALUES ?s {{ <{E}a> }}",
        ).collect()
    }
    assert got == {(E + "a", E + "r", E + "b")}


def test_order_by_inline_aggregate(triples):
    """r6d: ORDER BY DESC(COUNT(?o)) sorts by a hidden aggregate
    column in the same groupBy — no alias needed, no extra shuffle."""
    rows = _q(
        triples,
        "?p WHERE { ?s ?p ?o } GROUP BY ?p "
        "ORDER BY DESC(COUNT(?o)) ?p LIMIT 2",
    ).collect()
    # age has 3 facts; knows/likes/name have 1 each → tie broken by ?p
    assert [r["p"] for r in rows] == [E + "age", E + "knows"]
    with pytest.raises(SparqlError, match="ORDER BY aggregates"):
        _q(triples, "?s WHERE { ?s e:age ?a } ORDER BY DESC(COUNT(?s))")


def test_predicate_object_lists_and_a_shorthand(triples):
    """r6d Turtle-style sugar: `;` shares the subject, `,` shares the
    (subject, predicate); `a` is rdf:type."""
    got = {
        r["x"]
        for r in _q(
            triples, "?x WHERE { ?x e:age ?age ; e:knows ?y }"
        ).collect()
    }
    assert got == {E + "a"}
    got2 = {
        r["x"]
        for r in _q(
            triples, '?x WHERE { ?x e:name "alice" , "alice" ; e:age ?a . }'
        ).collect()
    }
    assert got2 == {E + "a"}
    # trailing semicolon before '}' is legal
    got3 = {
        r["x"]
        for r in _q(triples, "?x WHERE { ?x e:age ?a ; }").collect()
    }
    assert len(got3) == 3
    # `a` rdf:type shorthand (needs typed rows)
    from yamlpyowl_spark.operators.sparql import make_query

    spark = triples.sparkSession
    T2 = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    t = triples.unionByName(
        spark.createDataFrame(
            [(E + "a", T2, E + "Person", False, None, E)], SCHEMA
        )
    )
    got4 = {
        r["x"]
        for r in make_query(
            t, f"PREFIX e: <{E}> SELECT ?x WHERE {{ ?x a e:Person }}"
        ).collect()
    }
    assert got4 == {E + "a"}
    # `a` composes with the path grammar and sugar
    got5 = {
        r["x"]
        for r in make_query(
            t,
            f"PREFIX e: <{E}> SELECT ?x WHERE "
            f"{{ ?x a e:Person ; e:age ?g }}",
        ).collect()
    }
    assert got5 == {E + "a"}


def test_blank_node_property_lists_and_labels(triples):
    """r6d: `[ :p ?o ]` allocates a query-scoped anonymous variable
    (never projected, never joined across subqueries); `_:label` acts
    as a variable with the same scoping (§4.1.4)."""
    # object-position bracket: someone a knows who has an age
    got = {
        r["x"]
        for r in _q(triples, "?x WHERE { ?x e:knows [ e:likes ?z ] }").collect()
    }
    assert got == {E + "a"}  # a knows b, b likes c
    # subject-position bracket with its own list
    got2 = {
        r["z"]
        for r in _q(triples, "?z WHERE { [ e:age ?g ; e:knows ?z ] }").collect()
    }
    assert got2 == {E + "b"}
    # _:label shares bindings across patterns but is not projectable
    got3 = {
        r["z"]
        for r in _q(
            triples, "?z WHERE { _:n e:age ?g . _:n e:knows ?z }"
        ).collect()
    }
    assert got3 == {E + "b"}
    # bracket vars never appear in SELECT *
    cols = _q(triples, "* WHERE { ?x e:knows [ e:likes ?z ] }").columns
    assert set(cols) == {"x", "z"}


def test_rdf_collection_in_pattern(spark):
    """r6d: `( e1 e2 )` desugars to the rdf:first/rest/nil chain with
    anonymous chain variables; `()` is the rdf:nil constant."""
    from yamlpyowl_spark.operators.sparql import make_query

    R = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    rows = [
        (E + "x", E + "p", "_:l0", False, None, E),
        ("_:l0", R + "first", E + "a", False, None, E),
        ("_:l0", R + "rest", "_:l1", False, None, E),
        ("_:l1", R + "first", E + "b", False, None, E),
        ("_:l1", R + "rest", R + "nil", False, None, E),
        (E + "y", E + "p", R + "nil", False, None, E),
    ]
    t = spark.createDataFrame(rows, SCHEMA)
    got = {
        r["s"]
        for r in make_query(
            t, f"PREFIX e: <{E}> SELECT ?s WHERE {{ ?s e:p ( e:a e:b ) }}"
        ).collect()
    }
    assert got == {E + "x"}
    # a shorter list constant does not match the two-element chain
    got2 = make_query(
        t, f"PREFIX e: <{E}> SELECT ?s WHERE {{ ?s e:p ( e:a ) }}"
    ).collect()
    assert got2 == []
    # the empty collection is the rdf:nil constant
    got3 = {
        r["s"]
        for r in make_query(
            t, f"PREFIX e: <{E}> SELECT ?s WHERE {{ ?s e:p () }}"
        ).collect()
    }
    assert got3 == {E + "y"}
    # element variables bind through the chain
    got4 = {
        (r["s"], r["v"])
        for r in make_query(
            t, f"PREFIX e: <{E}> SELECT ?s ?v WHERE {{ ?s e:p ( ?v e:b ) }}"
        ).collect()
    }
    assert got4 == {(E + "x", E + "a")}


def test_typed_literal_objects(spark):
    """r6d: `"lex"^^<dt>` in object position matches the lexical form
    AND the stored datatype (NULL datatype reads as xsd:string);
    language tags and non-object positions raise loudly."""
    from yamlpyowl_spark.operators.sparql import make_query

    X = "http://www.w3.org/2001/XMLSchema#"
    rows = [
        (E + "a", E + "v", "30", True, X + "integer", E),
        (E + "b", E + "v", "30", True, X + "double", E),
        (E + "c", E + "v", "30", True, None, E),  # plain → xsd:string
    ]
    t = spark.createDataFrame(rows, SCHEMA)
    got = {
        r["s"]
        for r in make_query(
            t,
            f'PREFIX e: <{E}> PREFIX xsd: <{X}> SELECT ?s WHERE '
            f'{{ ?s e:v "30"^^xsd:integer }}',
        ).collect()
    }
    assert got == {E + "a"}
    got2 = {
        r["s"]
        for r in make_query(
            t,
            f'PREFIX e: <{E}> PREFIX xsd: <{X}> SELECT ?s WHERE '
            f'{{ ?s e:v "30"^^xsd:string }}',
        ).collect()
    }
    assert got2 == {E + "c"}
    with pytest.raises(SparqlError, match="language-tagged"):
        make_query(t, f'PREFIX e: <{E}> SELECT ?s WHERE {{ ?s e:v "x"@en }}')
    with pytest.raises(SparqlError, match="quoted literal"):
        make_query(
            t,
            f"PREFIX e: <{E}> PREFIX xsd: <{X}> SELECT ?s WHERE "
            f"{{ ?s e:v <urn:x>^^xsd:string }}",
        )


def test_boolean_literal_terms(spark):
    """r6d: lowercase `true`/`false` in term position match the stored
    boolean lexicals."""
    from yamlpyowl_spark.operators.sparql import make_query

    X = "http://www.w3.org/2001/XMLSchema#"
    rows = [
        (E + "a", E + "flag", "true", True, X + "boolean", E),
        (E + "b", E + "flag", "false", True, X + "boolean", E),
    ]
    t = spark.createDataFrame(rows, SCHEMA)
    got = {
        r["s"]
        for r in make_query(
            t, f"PREFIX e: <{E}> SELECT ?s WHERE {{ ?s e:flag true }}"
        ).collect()
    }
    assert got == {E + "a"}


# -- r7 correctness fixes (ADVICE r6 + verdict wrong #1) ---------------------


def test_substr_negative_start_xpath_window(triples):
    # XPath fn:substring window semantics: SUBSTR("alice", -1, 3) keeps
    # positions max(-1,1)..(-1+3-1) -> "a"; Spark's native negative
    # start (count from the end) must NOT leak through
    got = {
        tuple(r)
        for r in _q(
            triples,
            '?n ?s WHERE { ?x e:name ?n . BIND(SUBSTR(?n, -1, 3) AS ?s) }',
        ).collect()
    }
    assert got == {("alice", "a")}
    # fully out-of-window start yields ""
    got = {
        r[1]
        for r in _q(
            triples,
            '?n ?s WHERE { ?x e:name ?n . BIND(SUBSTR(?n, -5, 3) AS ?s) }',
        ).collect()
    }
    assert got == {""}


def test_seconds_fractional(spark):
    rows = [(E + "x", E + "at", "2024-03-15T10:30:05.7", True, None, E)]
    t = spark.createDataFrame(rows, SCHEMA)
    got = [
        r[0]
        for r in make_query(
            t,
            f"PREFIX e: <{E}> SELECT ?s WHERE "
            f"{{ ?x e:at ?t . BIND(SECONDS(?t) AS ?s) }}",
        ).collect()
    ]
    assert got == [5.7]


def test_count_distinct_star_raises(triples):
    with pytest.raises(SparqlError, match=r"COUNT\(DISTINCT \*\)"):
        _q(triples, "(COUNT(DISTINCT *) AS ?n) WHERE { ?x e:age ?a }")


def test_order_by_expression_key_raises(triples):
    # previously misparsed silently: STRLEN(?v) sorted ascending by ?v
    with pytest.raises(SparqlError, match="ORDER BY"):
        _q(triples, "?a WHERE { ?x e:age ?a } ORDER BY STRLEN(?a)")
    with pytest.raises(SparqlError, match="ORDER BY"):
        _q(triples, "?a WHERE { ?x e:age ?a } ORDER BY DESC(STRLEN(?a))")


def test_group_by_expression_key_raises(triples):
    # previously grabbed ['x','s'] as group keys
    with pytest.raises(SparqlError, match="GROUP BY"):
        _q(
            triples,
            "?s (COUNT(?a) AS ?n) WHERE { ?x e:age ?a } "
            "GROUP BY (STR(?x) AS ?s)",
        )


def test_order_and_group_by_plain_keys_still_parse(triples):
    got = [
        tuple(r)
        for r in _q(
            triples,
            "?x (COUNT(?a) AS ?n) WHERE { ?x e:age ?a } "
            "GROUP BY ?x ORDER BY DESC(?n) ?x LIMIT 2",
        ).collect()
    ]
    assert len(got) == 2 and all(n == 1 for _, n in got)
