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
