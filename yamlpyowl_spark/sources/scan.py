"""Source-table reader: Iceberg when available, parquet otherwise.

The deployment target is an Iceberg table of source-code repositories
(BASELINE.json input_hint) — partitioned/bucketed by repo so partition
pruning and file skipping hit before our pushed filters. The sandbox
has no Iceberg runtime jars, so reads fall back to plain parquet with
identical downstream semantics (the pipeline only needs the 5-column
shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schema import SOURCE_SCHEMA

_REQUIRED = [f.name for f in SOURCE_SCHEMA.fields]


def read_source_table(spark: SparkSession, src: str) -> DataFrame:
    """``src``: an Iceberg table name (``catalog.db.table``) or a
    parquet path. Validates the required column shape."""
    df = None
    if "/" not in src and "." in src:
        try:
            df = spark.read.format("iceberg").load(src)
        except Exception:
            df = None
    if df is None:
        try:
            df = spark.table(src)
        except Exception:
            df = None
    if df is None:
        df = spark.read.parquet(src)

    missing = [c for c in _REQUIRED if c not in df.columns]
    if missing:
        raise ValueError(f"source table {src!r} is missing columns: {missing}")
    return df.select(*_REQUIRED)
