"""Watermarked window aggregation + custom stateful sessionization
over an event stream — the two Structured Streaming patterns a
training-data pipeline needs beyond plain incremental ingest.

* :func:`windowed_event_counts` — tumbling-window counts per event
  type with a watermark, so late events within the bound still update
  their window and state for closed windows is dropped (bounded state
  at any input rate: state size tracks #open-windows × #types, never
  the stream length).

* :func:`sessionize_stream` — gap-based sessions via
  ``applyInPandasWithState`` (the custom-stateful-operator escape
  hatch): per-user state holds the open session; an event beyond the
  gap closes it and emits a row. EVENT-TIME timeouts (watermark-driven,
  not wall-clock) flush idle users, so state is bounded by #active
  users and drains deterministically under ``availableNow``.

Both take any streaming DataFrame with (user_id, event_type, ts) —
the shape of the ``events`` test table — and are exercised with file
sources + ``availableNow`` in tests (same operators run unchanged
against Kafka/rate sources on a cluster).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

SESSION_GAP_SEC = 1800


@contextmanager
def scoped_state_partitions(spark, n: int | None = None):
    """Pin ``spark.sql.shuffle.partitions`` for the duration of a
    streaming drain and restore it afterwards.

    Streaming stateful operators take their state-store partition count
    from this setting at first-batch planning (AQE cannot coalesce a
    streaming shuffle), and every partition pays state-provider init +
    commit per batch — 64 near-empty HDFS-backed stores cost ~1 s per
    drain at local[32] (measured, r7). The default sizes the count to
    the session's parallelism (state cardinality for these drains is
    bounded by open windows × types / distinct keys in the watermark,
    thousands of rows — orders of magnitude under a per-partition
    load concern at any input scale); production jobs with huge state
    pass an explicit ``n``. Batch queries planned inside the scope are
    unaffected in practice: AQE re-coalesces their shuffles at runtime."""
    sc = spark.sparkContext
    if n is None:
        n = max(8, sc.defaultParallelism // 4)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window event counts with late-data handling.

    The watermark bounds BOTH lateness tolerance and state: windows
    older than (max event time − watermark) are finalized and their
    state evicted — without it, a 100-TB stream accumulates unbounded
    window state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def drain_windowed_event_counts(
    spark,
    input_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Run :func:`windowed_event_counts` as a REAL streaming query over
    a file source and drain it with ``availableNow`` — the driver-gate
    surface (r2 verdict #9): the batch-readable result comes back from
    the sink, so a DuckDB ``time_bucket`` oracle can verify the
    streaming operator end-to-end (state store, watermark tracking and
    trigger machinery all engaged).

    Sink note: the drain uses COMPLETE mode into a memory sink so every
    window — including those the final watermark has not passed — is in
    the returned table; the production path is append mode into files,
    where closed windows finalize incrementally (bounded sink size).
    Complete-mode memory collects the aggregate to the driver: fine for
    a verification drain, not the 100-TB serving path."""
    import os
    import tempfile
    import uuid

    schema = spark.read.parquet(input_path).schema
    if os.path.isfile(input_path):
        # the file stream source lists a DIRECTORY; production inputs
        # are landing dirs already — wrap a single-file fixture
        d = tempfile.mkdtemp(prefix="wec_in_")
        os.symlink(os.path.abspath(input_path), os.path.join(d, "part-0.parquet"))
        input_path = d
    stream = spark.readStream.schema(schema).parquet(input_path)
    # watermarks require TIMESTAMP; the fixture's ts is TIMESTAMP_NTZ —
    # cast through the (UTC) session zone and back on output
    ntz = dict(stream.dtypes).get("ts") == "timestamp_ntz"
    if ntz:
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = windowed_event_counts(stream, window=window, watermark=watermark)
    if ntz:
        agg = agg.select(
            F.col("window_start").cast("timestamp_ntz").alias("window_start"),
            F.col("window_end").cast("timestamp_ntz").alias("window_end"),
            "event_type",
            "n_events",
        )
    name = f"wec_{uuid.uuid4().hex}"
    with scoped_state_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="wec_ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def dedup_stream(events: DataFrame, keys=("event_id",), watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same key within
    the watermark bound (``dropDuplicatesWithinWatermark``) — the
    streaming twin of ``docops.exact_dedup_groups`` and the standard
    at-least-once → effectively-once ingest repair. State holds one
    entry per key seen within the watermark window and is EVICTED as
    the watermark advances — bounded by key arrival rate × window, not
    stream length (plain ``dropDuplicates`` on a stream never evicts)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(keys))


def drain_dedup_counts(spark, input_path: str, watermark: str = "2 hours") -> DataFrame:
    """Driver-gate drain for :func:`dedup_stream`: run it as a real
    availableNow streaming query over a file source and return per-type
    counts of the deduplicated stream (append mode — first-seen rows
    emit immediately; duplicates never do)."""
    import os
    import tempfile
    import uuid

    schema = spark.read.parquet(input_path).schema
    if os.path.isfile(input_path):
        d = tempfile.mkdtemp(prefix="sdd_in_")
        os.symlink(os.path.abspath(input_path), os.path.join(d, "part-0.parquet"))
        input_path = d
    stream = spark.readStream.schema(schema).parquet(input_path)
    ntz = dict(stream.dtypes).get("ts") == "timestamp_ntz"
    if ntz:
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    deduped = dedup_stream(stream)
    name = f"sdd_{uuid.uuid4().hex}"
    with scoped_state_partitions(spark):
        q = (
            deduped.select("event_type", "event_id")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="sdd_ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
    )


SESSION_OUT_SCHEMA = (
    "user_id BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, n_events BIGINT"
)
_SESSION_STATE_SCHEMA = "start_s DOUBLE, end_s DOUBLE, n BIGINT"


def _session_fn(key, pdf_iter, state):
    """Per-user session accumulator (runs Arrow-batched per group).

    State = the open session (start, last-event-time, count). Events
    arriving within SESSION_GAP_SEC extend it; a bigger gap closes the
    session and emits it. An event-time timeout (fires when the
    WATERMARK passes last-event + gap) flushes users idle across
    triggers — data-driven, so an ``availableNow`` drain terminates
    without wall-clock waits."""
    import pandas as pd

    def emit(sessions):
        return pd.DataFrame(
            {
                "user_id": [key[0]] * len(sessions),
                "session_start": [pd.Timestamp(s, unit="s") for s, _, _ in sessions],
                "session_end": [pd.Timestamp(e, unit="s") for _, e, _ in sessions],
                "n_events": [int(n) for _, _, n in sessions],
            }
        )

    if state.hasTimedOut:
        if state.exists:
            start_s, end_s, n = state.get
            state.remove()
            yield emit([(start_s, end_s, n)])
        return

    ts = []
    for pdf in pdf_iter:
        ts.extend(pdf["ts"].astype("int64").floordiv(1_000_000_000).tolist())
    ts.sort()

    out = []
    if state.exists:
        start_s, end_s, n = state.get
    else:
        start_s = end_s = None
        n = 0
    for t in ts:
        t = float(t)
        if start_s is None:
            start_s, end_s, n = t, t, 1
        elif t - end_s <= SESSION_GAP_SEC:
            end_s, n = t, n + 1
        else:
            out.append((start_s, end_s, n))
            start_s, end_s, n = t, t, 1
    state.update((start_s, end_s, n))
    # flush when the watermark passes the session-close boundary (must
    # stay strictly ahead of the current watermark or Spark rejects it)
    wm_ms = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(int((end_s + SESSION_GAP_SEC + 1) * 1000), wm_ms + 1000))

    if out:
        yield emit(out)


def sessionize_stream(events: DataFrame, watermark: str = "10 seconds") -> DataFrame:
    """Gap-based sessionization as a custom stateful operator
    (``applyInPandasWithState``). Emits CLOSED sessions; the open
    session per user lives in the state store (bounded by #active
    users, flushed by a watermark-driven event-time timeout)."""
    return (
        events.select("user_id", "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
