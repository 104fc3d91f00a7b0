"""Incremental (Structured Streaming) KG construction: drain, add
files, drain again — increments only, and the final triple set equals
the batch pipeline's output."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from yamlpyowl_spark.plans.pipeline import KGPipeline
from yamlpyowl_spark.sources.corpus import corpus_rows
from yamlpyowl_spark.sources.fixtures import build_default_import_map
from yamlpyowl_spark.streaming import run_incremental


def _write_rows(rows, path):
    cols = list(zip(*rows))
    pq.write_table(
        pa.table(
            {
                "repo": list(cols[0]),
                "path": list(cols[1]),
                "commit": list(cols[2]),
                "lang": list(cols[3]),
                "content": list(cols[4]),
            }
        ),
        path,
    )


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    src = tmp_path_factory.mktemp("stream_in")
    out = tmp_path_factory.mktemp("stream_out")
    return str(src), str(out)


def test_incremental_equals_batch(spark, dirs):
    src_dir, out_dir = dirs
    rows = corpus_rows(n_forks=2)
    half1 = [r for r in rows if r[0] != "org/pizza-kb"]
    half2 = [r for r in rows if r[0] == "org/pizza-kb"]
    imap = build_default_import_map()

    _write_rows(half1, os.path.join(src_dir, "batch1.parquet"))
    run_incremental(spark, src_dir, out_dir, import_map=imap)
    t1 = spark.read.parquet(f"{out_dir}/triples").drop("run_id")
    n1 = t1.count()
    assert n1 > 0
    assert t1.filter(F.col("src_repo") == "org/pizza-kb").count() == 0

    # new file lands → only the increment is processed
    _write_rows(half2, os.path.join(src_dir, "batch2.parquet"))
    run_incremental(spark, src_dir, out_dir, import_map=imap)
    t2 = spark.read.parquet(f"{out_dir}/triples").drop("run_id")
    assert t2.filter(F.col("src_repo") == "org/pizza-kb").count() > 0

    # third drain with nothing new: no growth
    run_incremental(spark, src_dir, out_dir, import_map=imap)
    assert spark.read.parquet(f"{out_dir}/triples").count() == t2.count()

    # streaming output == batch pipeline output on the same corpus
    pipe = KGPipeline(spark, import_map=imap, parse_partitions=8)
    batch_triples, _ = pipe.parse(
        spark.createDataFrame(rows, schema="repo string, path string, commit string, lang string, content string")
    )
    assert batch_triples.count() == t2.count()
    assert batch_triples.exceptAll(t2).isEmpty()
    assert t2.exceptAll(batch_triples).isEmpty()

    errors = spark.read.parquet(f"{out_dir}/errors")
    assert errors.filter(F.col("stage") == "yaml_load").count() == 1
