"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: run the full KG-construction pipeline
(scan → filter → Arrow-batched parse UDF → triples) on the
deterministic synthetic source-code corpus and return the triples
DataFrame.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
(SURVEY.md §2 + training-data ops); Spark result and DuckDB oracle are
compared side-by-side by the driver at sf=0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG triples built by the distributed pipeline.

    Also touches /root/testdata/sf0.001 (smoke that the relational
    source tables load) before returning the KG output.
    """
    from yamlpyowl_spark.queries import kg_triples

    sf_dir = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
    try:
        spark.read.parquet(f"{sf_dir}/documents.parquet").limit(1).count()
    except Exception:
        pass
    return kg_triples(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from yamlpyowl_spark.queries import QUERIES
    from yamlpyowl_spark.sources.artifacts import ensure_artifacts

    ensure_artifacts()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from yamlpyowl_spark.queries import ORACLES
    from yamlpyowl_spark.sources.artifacts import ensure_artifacts

    ensure_artifacts()
    return dict(ORACLES)
