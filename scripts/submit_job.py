"""spark-submit entry point: the north-rule deployment path.

    spark-submit --master <cluster> --py-files yamlpyowl_spark_pkg.zip \
        scripts/submit_job.py SRC_PARQUET OUT_DIR [--reason]

The package arrives on executors via --py-files (no repo checkout
needed there); the driver only needs this file + the zip."""

import sys

from pyspark.sql import SparkSession


def main(argv):
    src, out = argv[0], argv[1]
    reason = "--reason" in argv[2:]
    spark = SparkSession.builder.appName("yamlpyowl-spark-submit").getOrCreate()
    from yamlpyowl_spark.plans.pipeline import KGPipeline
    from yamlpyowl_spark.sources.fixtures import build_default_import_map
    from yamlpyowl_spark.sources.scan import read_source_table

    df = read_source_table(spark, src)
    pipe = KGPipeline(spark, import_map=build_default_import_map())
    res = pipe.materialize(df, out, resume=True, reason=reason)
    print(f"run {res['run_id']}: {res['n_new_docs']} new documents", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
