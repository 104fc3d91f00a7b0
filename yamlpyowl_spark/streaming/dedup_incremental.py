"""Incremental near-dup detection: a document STREAM against the
existing corpus via a stream-static LSH join.

The 100-TB ingestion shape: the corpus's banded MinHash bucket table
is built ONCE (batch, the same ``docops`` banding the offline dedup
uses) and each incoming micro-batch of new documents is banded
STATELESSLY (``minhash_signatures_stateless`` — per-row array-local
min, no groupBy, so no streaming state or watermark is needed) and
equi-joined against it on (band, bucket). Work per batch is
O(new docs × matching buckets) — never a scan of the corpus, never
an all-pairs product, and state is zero (the static side is a plain
DataFrame Spark re-broadcasts per batch; at cluster scale it is a
bucketed/Delta table the join prunes).

Output rows are (new_doc_id, corpus_doc_id) CANDIDATES — one row per
shared band, so a pair sharing several bands repeats; the drain dedups
batch-side. Verification (exact Jaccard) stays a downstream batch
step, exactly like the offline LSH-propose / exact-verify split.

Parallelism note: the file source's micro-batch task count IS the
input file layout — a single-file drop runs the per-row minhash on
ONE task (measured 5.5 s vs 0.7 s for 32 files at sf0.1). Ingestion
should land many files per batch (the norm for log/object-store
drops); the operator deliberately does NOT repartition per batch,
which would shuffle the raw text on every micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators import docops
from ..schema import arrow_local_df


def incremental_candidates(
    stream_docs: DataFrame, corpus_docs: DataFrame, bands: int = docops.LSH_BANDS
) -> DataFrame:
    """(new_doc_id, corpus_doc_id) candidate pairs for a streaming
    (doc_id, text) frame against a static corpus. The static bucket
    table is localCheckpointed once — per-batch cost never recomputes
    the corpus minhash."""
    static_buckets = docops.banded_signatures(
        docops.minhash_signatures(corpus_docs), bands
    ).localCheckpoint()
    new_banded = docops.banded_signatures(
        docops.minhash_signatures_stateless(stream_docs), bands
    )
    return (
        new_banded.alias("n")
        .join(static_buckets.alias("s"), ["band", "bucket"])
        .select(
            F.col("n.doc_id").alias("new_doc_id"),
            F.col("s.doc_id").alias("corpus_doc_id"),
        )
    )


def drain_incremental_candidates(
    spark, stream_path: str, corpus_docs: DataFrame
) -> DataFrame:
    """Run the incremental LSH ingest as a REAL availableNow streaming
    query over a file source and return the DISTINCT candidate pairs.

    r7: the drain runs the per-batch banding inside ``foreachBatch``
    with the BATCH ``minhash_signatures`` (explode → map-side partial
    min, whole-stage codegen) instead of the per-row
    ``minhash_signatures_stateless`` expression — the two are
    bit-identical by contract (module doc + tests), but the row-local
    higher-order-function form evaluates outside codegen and measured
    ~6× slower (10.4 s → ~2 s for a 49.6k-doc drop at local[32],
    guide §1.2 "per-task work"). ``foreachBatch`` hands each
    micro-batch over as a plain batch DataFrame, which is exactly what
    makes the aggregate legal here (a streaming groupBy would need a
    watermark and update mode). Results land in a parquet sink per
    batch — nothing is collected to the driver (the previous memory
    sink held every candidate row driver-side, guide §5).

    :func:`incremental_candidates` (the stateless per-row form) remains
    the operator for true continuous/low-latency sinks where a batch
    aggregate per trigger is not wanted."""
    import os
    import tempfile

    schema = spark.read.parquet(stream_path).schema
    if os.path.isfile(stream_path):
        d = tempfile.mkdtemp(prefix="inc_in_")
        os.symlink(os.path.abspath(stream_path), os.path.join(d, "part-0.parquet"))
        stream_path = d
    stream = spark.readStream.schema(schema).parquet(stream_path)

    static_buckets = docops.banded_signatures(
        docops.minhash_signatures(corpus_docs)
    ).localCheckpoint()
    # measured-size dispatch (guide §3.1): ONE count of the
    # checkpointed bucket table decides the per-batch join strategy —
    # under the bound every micro-batch joins against one broadcast
    # (no reshuffle of either side per batch); a corpus past the bound
    # keeps the shuffle join (at true ingest scale the static side is
    # a bucketed table the join prunes instead)
    if static_buckets.count() <= 100_000:
        static_buckets = F.broadcast(static_buckets)

    out_dir = tempfile.mkdtemp(prefix="inc_out_")
    pair_schema = "new_doc_id " + dict(stream.dtypes)["doc_id"] + ", corpus_doc_id " + dict(
        corpus_docs.dtypes
    )["doc_id"]
    # seed the sink so an empty drain still reads back with the schema
    arrow_local_df(spark, [], pair_schema).write.mode("overwrite").parquet(out_dir)

    def _process_batch(batch_df: DataFrame, _batch_id: int) -> None:
        cands = (
            docops.banded_signatures(docops.minhash_signatures(batch_df))
            .alias("n")
            .join(static_buckets.alias("s"), ["band", "bucket"])
            .select(
                F.col("n.doc_id").alias("new_doc_id"),
                F.col("s.doc_id").alias("corpus_doc_id"),
            )
        )
        cands.write.mode("append").parquet(out_dir)

    from .windowed import scoped_state_partitions

    # the per-batch groupBy minhash inside foreachBatch plans with the
    # streaming session's shuffle setting — size it like the stateful
    # drains (64 near-empty shuffle partitions per micro-batch cost
    # more scheduling than the aggregation itself at drain scale)
    with scoped_state_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(_process_batch)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="inc_ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(out_dir).distinct()
