"""Spark StructTypes for every pipeline table (see FIXTURES.md §2)."""

from pyspark.sql import types as T

# the only pipeline input — exact shape from BASELINE.json input_hint
SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ]
)

TRIPLE_FIELDS = [
    T.StructField("subj", T.StringType(), True),
    T.StructField("pred", T.StringType(), True),
    T.StructField("obj", T.StringType(), True),
    T.StructField("obj_is_literal", T.BooleanType(), True),
    T.StructField("obj_datatype", T.StringType(), True),
    T.StructField("doc_iri", T.StringType(), True),
]

LINEAGE_FIELDS = [
    T.StructField("src_repo", T.StringType(), False),
    T.StructField("src_path", T.StringType(), False),
    T.StructField("src_commit", T.StringType(), False),
    T.StructField("src_sha256", T.StringType(), False),
]

TRIPLES_SCHEMA = T.StructType(TRIPLE_FIELDS + LINEAGE_FIELDS)

ERRORS_SCHEMA = T.StructType(
    LINEAGE_FIELDS
    + [
        T.StructField("stage", T.StringType(), False),
        T.StructField("message", T.StringType(), False),
    ]
)

# combined parse-UDF output: one Arrow stream, split relationally afterwards
PARSED_SCHEMA = T.StructType(
    [T.StructField("rec", T.StringType(), False)]  # "t" (triple) | "e" (error)
    + TRIPLE_FIELDS
    + LINEAGE_FIELDS
    + [
        T.StructField("stage", T.StringType(), True),
        T.StructField("message", T.StringType(), True),
    ]
)

NODES_SCHEMA = T.StructType(
    [
        T.StructField("iri", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("doc_iri", T.StringType(), True),
    ]
    + LINEAGE_FIELDS
)

PROGRESS_SCHEMA = T.StructType(
    LINEAGE_FIELDS
    + [
        T.StructField("n_triples", T.LongType(), False),
        T.StructField("n_errors", T.LongType(), False),
        T.StructField("run_id", T.StringType(), False),
    ]
)


def arrow_local_df(spark, rows, schema):
    """JVM-resident local relation from driver rows (pandas → Arrow →
    LocalTableScan). A tuple-list ``createDataFrame`` plans as a
    pickled Python RDD instead, re-running a Python worker pass on
    EVERY downstream action (~0.4–1.7 s at local[32]) — measurably
    wrong for the small inline relations (VALUES datablocks, ASK
    results, driver-computed closures) queries touch once per action.

    ``schema`` is a DDL string, a StructType, or a plain column-name
    list (types then inferred from the values, as the tuple path
    would). Values must be Arrow-convertible (strings/bools/numbers/
    None — the callers' contract)."""
    import pandas as pd

    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    if isinstance(schema, T.StructType):
        cols = [f.name for f in schema.fields]
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=cols), schema=schema
        )
    # plain column-name list: keep the tuple path's type inference
    return spark.createDataFrame(pd.DataFrame(rows, columns=list(schema)))
