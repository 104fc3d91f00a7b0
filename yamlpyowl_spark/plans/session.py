"""SparkSession factory with scale-oriented defaults.

Tested on local[N]; the config is written for a multi-executor cluster:
AQE (runtime re-planning + skew-join splitting), Arrow-batched pandas
UDFs with a bounded batch size (ontology documents can be large — cap
rows per Arrow batch so a batch of big `content` strings fits in
executor memory), and a shuffle-partition count sized for the tested
scale (override per deployment).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession, functions as F


def ship_package(spark: SparkSession) -> str:
    """Ship ``yamlpyowl_spark`` to executors as a zip (the
    ``spark-submit --py-files`` equivalent when building the session in
    code). Without this, the parse UDF fails on workers whose
    PYTHONPATH doesn't include the repo checkout."""
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(tempfile.gettempdir(), "yamlpyowl_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, root))
    spark.sparkContext.addPyFile(zpath)
    return zpath


def get_spark(
    cpus: int | None = None,
    app_name: str = "yamlpyowl-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # 2x cores locally; on a real cluster size to ~128MB per task input
        shuffle_partitions = max(2 * cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # documents are whole files in `content`; cap Arrow batches so a
        # batch of ~10KB docs stays ~10MB in / tens of MB out per worker
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("YPO_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # text-heavy rows: small scan splits keep the scan+shuffle-write
        # phase parallel (a 128MB default turns a 256MB corpus into 2
        # serial scan tasks — an Amdahl bottleneck at high parallelism)
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    if os.environ.get("YPO_SESSION_WARMUP", "1") != "0":
        _warm_session(spark)
    return spark


def _warm_session(spark: SparkSession) -> None:
    """Engine + Python-worker warm-up at session build (r7).

    The first query of a fresh session otherwise pays all lazy engine
    init — SQL framework, whole-stage-codegen compiler, exchange/AQE
    machinery — plus the Python worker pool spawn for the first Arrow
    stage (~5 s each measured at local[32]; a 60-row first job took
    5.5 s cold vs 0.1 s warm). A long-lived session pays this exactly
    once, so it belongs to session construction, not to whichever
    operator happens to run first. The warm-up is data-independent
    (spark.range only — it never touches an input table and computes
    no query result) and idempotent; set YPO_SESSION_WARMUP=0 to skip
    (e.g. for sessions that never run SQL)."""
    try:
        n = spark.sparkContext.defaultParallelism

        def _ident(batches):
            yield from batches

        # one tiny shuffle (exchange + AQE path) and one Arrow stage
        # wide enough to spawn the full worker pool concurrently
        (
            spark.range(0, 4 * n, 1, n)
            .groupBy((F.col("id") % 4).alias("k"))
            .count()
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        (
            spark.range(0, n, 1, n)
            .mapInArrow(_ident, "id long")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
    except Exception:
        pass  # a degraded session (no noop sink, restricted master) still works
