"""Differential gate for the r5 FILTER expression compiler: every
expression in a deterministic grid is evaluated BOTH by make_query
(Spark) and by DuckDB SQL over the same rows — the two engines must
agree on the surviving subjects. This pins the compiler's comparison
typing (numeric vs lexical), three-valued NULL behavior under
OPTIONAL, boolean precedence, and the string/metadata functions
against an independent implementation.
"""

import duckdb
import pytest
from pyspark.sql import types as T

from yamlpyowl_spark.operators.sparql import make_query

E = "http://ex.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"

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

ROWS = [
    (E + "a", E + "v", "30", True, XSD + "integer", E),
    (E + "b", E + "v", "7", True, XSD + "integer", E),
    (E + "c", E + "v", "45.5", True, XSD + "double", E),
    (E + "d", E + "v", "apple", True, XSD + "string", E),
    (E + "e", E + "v", E + "iri-object", False, None, E),
    # f: a LITERAL whose lexical form equals e's IRI — sameTerm() must
    # tell them apart via the literal-ness companion (r5 verdict #2)
    (E + "f", E + "v", E + "iri-object", True, XSD + "string", E),
    # g: "30.0" — numerically equal to a's "30" but not the same term
    (E + "g", E + "v", "30.0", True, XSD + "double", E),
    # h: an xsd:dateTime lexical form for the YEAR()-family accessors
    (E + "h", E + "v", "2024-03-15T10:30:45", True, XSD + "dateTime", E),
]

# (sparql_filter, duckdb_where) — ?x binds subj, ?v binds obj.
# DuckDB side mirrors the documented dialect: ordering comparisons with
# a numeric side cast to DOUBLE (non-numeric drop out via NULL), =/!=
# lexical, STR identity, DATATYPE via the metadata columns.
_V = "t.obj"
_DT = f"(CASE WHEN t.obj_is_literal THEN coalesce(t.obj_datatype, '{XSD}string') END)"
GRID = [
    ("?v > 10", f"TRY_CAST({_V} AS DOUBLE) > 10"),
    ("?v <= 30", f"TRY_CAST({_V} AS DOUBLE) <= 30"),
    ('?v = "apple"', f"{_V} = 'apple'"),
    ('?v != "7"', f"{_V} <> '7'"),
    ("?v > 10 && ?v < 40", f"TRY_CAST({_V} AS DOUBLE) > 10 AND TRY_CAST({_V} AS DOUBLE) < 40"),
    ("?v < 10 || ?v > 40", f"TRY_CAST({_V} AS DOUBLE) < 10 OR TRY_CAST({_V} AS DOUBLE) > 40"),
    (
        "?v < 10 || ?v > 20 && ?v < 40",
        f"TRY_CAST({_V} AS DOUBLE) < 10 OR (TRY_CAST({_V} AS DOUBLE) > 20 AND TRY_CAST({_V} AS DOUBLE) < 40)",
    ),
    (
        '(?v < 10 || ?v > 40) && ?v != "45.5"',
        f"(TRY_CAST({_V} AS DOUBLE) < 10 OR TRY_CAST({_V} AS DOUBLE) > 40) AND {_V} <> '45.5'",
    ),
    ("!(?v > 10)", f"NOT (TRY_CAST({_V} AS DOUBLE) > 10)"),
    ('?v IN ("7", "apple")', f"{_V} IN ('7', 'apple')"),
    ('?v NOT IN ("7", "apple")', f"{_V} NOT IN ('7', 'apple')"),
    ("?v * 2 > 60", f"TRY_CAST({_V} AS DOUBLE) * 2 > 60"),
    ("(?v + 5) / 2 > 20", f"(TRY_CAST({_V} AS DOUBLE) + 5) / 2 > 20"),
    ('regex(?v, "^a")', f"regexp_matches({_V}, '^a')"),
    ('STRSTARTS(?v, "a")', f"starts_with({_V}, 'a')"),
    ('STRENDS(?v, "e")', f"{_V} LIKE '%e'"),
    ('CONTAINS(?v, "ppl")', f"contains({_V}, 'ppl')"),
    ("STRLEN(?v) = 2", f"length({_V}) = 2"),
    ('UCASE(?v) = "APPLE"', f"upper({_V}) = 'APPLE'"),
    ('STR(?v) != ""', f"{_V} <> ''"),
    ("isLiteral(?v)", "t.obj_is_literal"),
    ("isIRI(?v)", "NOT t.obj_is_literal AND substr(t.obj,1,2) <> '_:'"),
    (f"DATATYPE(?v) = <{XSD}integer>", f"{_DT} = '{XSD}integer'"),
    (f"DATATYPE(?v) != <{XSD}integer>", f"{_DT} <> '{XSD}integer'"),
    (
        f'isLiteral(?v) && (DATATYPE(?v) = <{XSD}double> || ?v IN ("7"))',
        f"t.obj_is_literal AND ({_DT} = '{XSD}double' OR {_V} IN ('7'))",
    ),
    (
        '!(?v IN ("apple")) && STRLEN(?v) >= 2',
        f"NOT ({_V} IN ('apple')) AND length({_V}) >= 2",
    ),
    # --- r6 value-expression layer ---
    ('SUBSTR(?v, 1, 3) = "app"', f"substr({_V}, 1, 3) = 'app'"),
    ('SUBSTR(?v, 2) = "pple"', f"substr({_V}, 2) = 'pple'"),
    # SPARQL REPLACE is regex-based and replaces EVERY match
    ('REPLACE(?v, "p", "b") = "abble"', f"regexp_replace({_V}, 'p', 'b', 'g') = 'abble'"),
    ('REPLACE(?v, "[05]", "x") = "3x.x"', f"regexp_replace({_V}, '[05]', 'x', 'g') = '3x.x'"),
    ('CONCAT(?v, "!") = "apple!"', f"concat({_V}, '!') = 'apple!'"),
    ('CONCAT("x", ?v, "y") = "x7y"', f"concat('x', {_V}, 'y') = 'x7y'"),
    ("ABS(?v - 40) < 6", f"abs(TRY_CAST({_V} AS DOUBLE) - 40) < 6"),
    ("CEIL(?v) = 46", f"ceil(TRY_CAST({_V} AS DOUBLE)) = 46"),
    ("FLOOR(?v) = 45", f"floor(TRY_CAST({_V} AS DOUBLE)) = 45"),
    ("ROUND(?v) = 46", f"round(TRY_CAST({_V} AS DOUBLE)) = 46"),
    ('COALESCE(?v, "z") = "7"', f"coalesce({_V}, 'z') = '7'"),
    (
        'IF(?v > 10, "big", "small") = "small"',
        # two-branch CASE: a NULL condition yields NULL (error
        # propagation), matching the Spark compile
        f"(CASE WHEN TRY_CAST({_V} AS DOUBLE) > 10 THEN 'big' "
        f"WHEN NOT (TRY_CAST({_V} AS DOUBLE) > 10) THEN 'small' END) = 'small'",
    ),
    # --- sameTerm(): lexical form + literal-vs-IRI agreement, never
    # numeric coercion (r5 verdict #2 / advice #2) ---
    (f"sameTerm(?v, <{E}iri-object>)", f"{_V} = '{E}iri-object' AND NOT t.obj_is_literal"),
    (f'sameTerm(?v, "{E}iri-object")', f"{_V} = '{E}iri-object' AND t.obj_is_literal"),
    ("sameTerm(?v, 30)", f"{_V} = '30' AND t.obj_is_literal"),
    ('!sameTerm(?v, "apple") && STRLEN(?v) > 1',
     f"NOT ({_V} = 'apple' AND t.obj_is_literal) AND length({_V}) > 1"),
    # --- r6 second function batch: STRBEFORE/STRAFTER, digests,
    # dateTime accessors, isNumeric, langMatches ---
    (
        'STRBEFORE(?v, "p") = "a"',
        f"(CASE WHEN strpos({_V}, 'p') > 0 "
        f"THEN substr({_V}, 1, strpos({_V}, 'p') - 1) ELSE '' END) = 'a'",
    ),
    (
        # arg2 absent -> "" (both engines must agree on the empty case)
        'STRAFTER(?v, "pp") = ""',
        f"(CASE WHEN strpos({_V}, 'pp') > 0 "
        f"THEN substr({_V}, strpos({_V}, 'pp') + 2) ELSE '' END) = ''",
    ),
    (
        'STRAFTER(?v, ".") = "5"',
        f"(CASE WHEN strpos({_V}, '.') > 0 "
        f"THEN substr({_V}, strpos({_V}, '.') + 1) ELSE '' END) = '5'",
    ),
    (f'MD5(?v) = "{__import__("hashlib").md5(b"apple").hexdigest()}"',
     f"md5({_V}) = md5('apple')"),
    (f'SHA256(?v) = "{__import__("hashlib").sha256(b"7").hexdigest()}"',
     f"sha256({_V}) = sha256('7')"),
    # DuckDB has no sha1() — pin Spark against the hashlib constant
    (f'SHA1(?v) = "{__import__("hashlib").sha1(b"apple").hexdigest()}"',
     f"{_V} = 'apple'"),
    ("YEAR(?v) = 2024", f"year(TRY_CAST({_V} AS TIMESTAMP)) = 2024"),
    ("MONTH(?v) = 3 && DAY(?v) = 15",
     f"month(TRY_CAST({_V} AS TIMESTAMP)) = 3 AND day(TRY_CAST({_V} AS TIMESTAMP)) = 15"),
    ("HOURS(?v) = 10 && MINUTES(?v) = 30 && SECONDS(?v) = 45",
     f"hour(TRY_CAST({_V} AS TIMESTAMP)) = 10 AND minute(TRY_CAST({_V} AS TIMESTAMP)) = 30 "
     f"AND second(TRY_CAST({_V} AS TIMESTAMP)) = 45"),
    ("isNumeric(?v)", f"t.obj_is_literal AND TRY_CAST({_V} AS DOUBLE) IS NOT NULL"),
    ("!isNumeric(?v)", f"NOT (t.obj_is_literal AND TRY_CAST({_V} AS DOUBLE) IS NOT NULL)"),
    # LANG() is "" in this dialect: "*" requires a non-empty tag, so
    # no row survives — both engines agree on the empty set
    ('langMatches(LANG(?v), "*")', "FALSE"),
]


@pytest.fixture(scope="module")
def tdf(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(subj VARCHAR, pred VARCHAR, obj VARCHAR, "
        "obj_is_literal BOOLEAN, obj_datatype VARCHAR, doc_iri VARCHAR)"
    )
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?,?)", ROWS)
    return con


@pytest.mark.parametrize("sparql_filter,sql_where", GRID, ids=[g[0] for g in GRID])
def test_filter_matches_duckdb(tdf, ddb, sparql_filter, sql_where):
    q = (
        f"PREFIX e: <{E}> SELECT ?x WHERE "
        f"{{ ?x e:v ?v . FILTER({sparql_filter}) }}"
    )
    spark_got = {r[0] for r in make_query(tdf, q).collect()}
    duck_got = {
        r[0]
        for r in ddb.execute(
            f"SELECT DISTINCT subj FROM t WHERE pred = '{E}v' AND ({sql_where})"
        ).fetchall()
    }
    assert spark_got == duck_got, f"FILTER({sparql_filter})"


# ---------------------------------------------------------------------------
# three-valued logic under OPTIONAL: NULL-bound variables vs DuckDB
# LEFT JOIN semantics
# ---------------------------------------------------------------------------

KNOWS = [
    (E + "a", E + "knows", E + "b", False, None, E),
]

OPT_GRID = [
    # comparison on a NULL-bound optional var: NULL -> dropped
    ("?y > 0", "TRY_CAST(k.obj AS DOUBLE) > 0"),
    ('?y = "zzz"', "k.obj = 'zzz'"),
    # bound() / !bound() are NULL tests, not comparisons
    ("bound(?y)", "k.obj IS NOT NULL"),
    ("!bound(?y)", "k.obj IS NULL"),
    # negation of a NULL comparison stays NULL (row dropped), unlike
    # !bound(); DuckDB NOT(NULL) is NULL too -> same survivors
    ("!(?y > 0)", "NOT (TRY_CAST(k.obj AS DOUBLE) > 0)"),
    # disjunction where one side is a NULL comparison
    ('?v = "30" || ?y > 0', "t.obj = '30' OR TRY_CAST(k.obj AS DOUBLE) > 0"),
    # COALESCE falls through a NULL-bound optional var
    ('COALESCE(?y, "none") = "none"', "coalesce(k.obj, 'none') = 'none'"),
    # IF over bound(): decidable for every row, NULL-bound included
    (
        'IF(bound(?y), "y", "n") = "n"',
        "(CASE WHEN k.obj IS NOT NULL THEN 'y' ELSE 'n' END) = 'n'",
    ),
]


@pytest.fixture(scope="module")
def tdf2(spark):
    return spark.createDataFrame(ROWS + KNOWS, SCHEMA)


@pytest.fixture(scope="module")
def ddb2():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(subj VARCHAR, pred VARCHAR, obj VARCHAR, "
        "obj_is_literal BOOLEAN, obj_datatype VARCHAR, doc_iri VARCHAR)"
    )
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?,?)", ROWS + KNOWS)
    return con


@pytest.mark.parametrize("sparql_filter,sql_where", OPT_GRID, ids=[g[0] for g in OPT_GRID])
def test_optional_filter_matches_duckdb(tdf2, ddb2, sparql_filter, sql_where):
    q = (
        f"PREFIX e: <{E}> SELECT ?x WHERE "
        f"{{ ?x e:v ?v . OPTIONAL {{ ?x e:knows ?y }} . FILTER({sparql_filter}) }}"
    )
    spark_got = {r[0] for r in make_query(tdf2, q).collect()}
    duck_got = {
        r[0]
        for r in ddb2.execute(
            f"SELECT DISTINCT t.subj FROM t "
            f"LEFT JOIN (SELECT subj, obj FROM t WHERE pred = '{E}knows') k "
            f"ON t.subj = k.subj WHERE t.pred = '{E}v' AND ({sql_where})"
        ).fetchall()
    }
    assert spark_got == duck_got, f"FILTER({sparql_filter})"


# ---------------------------------------------------------------------------
# r6d full-query constructs: boolean HAVING, final VALUES, ORDER BY
# inline aggregates, typed literals, and `;` sugar — each evaluated by
# make_query AND an explicit DuckDB query over the same rows
# ---------------------------------------------------------------------------


def test_having_boolean_matches_duckdb(tdf2, ddb2):
    q = (
        "SELECT ?p (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p "
        "HAVING (?n > 2 && !(?n > 100) || ?n = 1)"
    )
    spark_got = {(r["p"], r["n"]) for r in make_query(tdf2, q).collect()}
    duck_got = set(
        ddb2.execute(
            "SELECT pred, count(obj) FROM t GROUP BY pred "
            "HAVING (count(obj) > 2 AND NOT count(obj) > 100) "
            "OR count(obj) = 1"
        ).fetchall()
    )
    assert spark_got == duck_got


def test_final_values_matches_duckdb(tdf2, ddb2):
    q = (
        f"SELECT ?p (COUNT(?o) AS ?n) WHERE {{ ?s ?p ?o }} GROUP BY ?p "
        f"VALUES ?p {{ <{E}knows> }}"
    )
    spark_got = {(r["p"], r["n"]) for r in make_query(tdf2, q).collect()}
    duck_got = set(
        ddb2.execute(
            f"SELECT pred, count(obj) FROM t WHERE pred = '{E}knows' "
            "GROUP BY pred"
        ).fetchall()
    )
    assert spark_got == duck_got


def test_order_by_inline_agg_matches_duckdb(tdf2, ddb2):
    q = (
        "SELECT ?p WHERE { ?s ?p ?o } GROUP BY ?p "
        "ORDER BY DESC(COUNT(?o)) ?p"
    )
    spark_got = [r["p"] for r in make_query(tdf2, q).collect()]
    duck_got = [
        r[0]
        for r in ddb2.execute(
            "SELECT pred FROM t GROUP BY pred "
            "ORDER BY count(obj) DESC, pred"
        ).fetchall()
    ]
    assert spark_got == duck_got


def test_typed_literal_matches_duckdb(tdf2, ddb2):
    q = (
        f"PREFIX e: <{E}> PREFIX xsd: <{XSD}> SELECT ?x WHERE "
        f'{{ ?x e:v "30"^^xsd:integer }}'
    )
    spark_got = {r["x"] for r in make_query(tdf2, q).collect()}
    duck_got = {
        r[0]
        for r in ddb2.execute(
            f"SELECT DISTINCT subj FROM t WHERE pred = '{E}v' "
            f"AND obj = '30' AND obj_is_literal "
            f"AND coalesce(obj_datatype, '{XSD}string') = '{XSD}integer'"
        ).fetchall()
    }
    assert spark_got == duck_got


def test_semicolon_sugar_matches_duckdb(tdf2, ddb2):
    q = (
        f"PREFIX e: <{E}> SELECT ?x ?y WHERE "
        f"{{ ?x e:v ?v ; e:knows ?y }}"
    )
    spark_got = {(r["x"], r["y"]) for r in make_query(tdf2, q).collect()}
    duck_got = set(
        ddb2.execute(
            f"SELECT DISTINCT a.subj, b.obj FROM t a JOIN t b "
            f"ON a.subj = b.subj WHERE a.pred = '{E}v' "
            f"AND b.pred = '{E}knows'"
        ).fetchall()
    )
    assert spark_got == duck_got
