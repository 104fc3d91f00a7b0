"""Incremental KG construction with Structured Streaming.

New source files landing in a directory are parsed incrementally:
``readStream`` (file source tracks processed files in the checkpoint) →
the same filter + Arrow-batched parse stage as the batch pipeline →
``foreachBatch`` writing each micro-batch into its own
``run_id=batch_<id>`` subdirectory with overwrite — the standard
idempotent-foreachBatch pattern: a batch replayed after a crash
rewrites the same directory instead of appending duplicates, so the
file outputs are exactly-once per input file (file-source checkpoint
guarantees each file lands in exactly one batch id).

The batch pipeline's ``_progress`` anti-join gives coarse-grained
resumability for scheduled batch runs; this gives continuous ingest —
same parse stage, two scheduling modes.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession

from ..plans.pipeline import KGPipeline, ontology_document_filter
from ..schema import SOURCE_SCHEMA


def incremental_kg_query(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    import_map: Optional[dict] = None,
    available_now: bool = True,
    parse_partitions: Optional[int] = None,
):
    """Start (and return) the streaming query. With
    ``available_now=True`` it drains everything currently in
    ``input_dir`` and stops — the incremental-batch pattern; call again
    after new files land and only those are processed."""
    pipe = KGPipeline(spark, import_map=import_map, parse_partitions=parse_partitions or 8)

    stream = (
        spark.readStream.schema(SOURCE_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    filtered = ontology_document_filter(stream)

    def process_batch(batch_df, batch_id: int):
        parsed = pipe.parsed(batch_df, already_filtered=True).persist()
        try:
            # batch-scoped overwrite = idempotent on replay (a crash
            # between the two writes re-runs the batch with the SAME
            # batch_id, overwriting rather than duplicating)
            pipe.triples(parsed).write.mode("overwrite").parquet(
                f"{out_dir}/triples/run_id=batch_{batch_id}"
            )
            pipe.errors(parsed).write.mode("overwrite").parquet(
                f"{out_dir}/errors/run_id=batch_{batch_id}"
            )
        finally:
            parsed.unpersist()

    writer = (
        filtered.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", f"{out_dir}/_stream_checkpoint")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_incremental(spark: SparkSession, input_dir: str, out_dir: str, **kw) -> None:
    """Drain whatever is currently in ``input_dir`` and return."""
    q = incremental_kg_query(spark, input_dir, out_dir, available_now=True, **kw)
    q.awaitTermination()
