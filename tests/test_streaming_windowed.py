"""Watermarked window aggregation + applyInPandasWithState
sessionization: late data lands in its window, watermark-expired data
is dropped, sessions close on gap and flush on timeout."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F, types as T

from yamlpyowl_spark.streaming import sessionize_stream, windowed_event_counts

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _write_events(path, rows):
    import datetime as dt

    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array(
                    [dt.datetime(2026, 1, 1) + dt.timedelta(seconds=r[2]) for r in rows],
                    pa.timestamp("us"),
                ),
            }
        ),
        path,
    )


def _drain(stream_df, out_dir, checkpoint):
    # file sink (not memory): supports checkpoint recovery across
    # drain-restart cycles, which is exactly what we exercise here
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


HOUR = 3600


def test_windowed_counts_with_late_data(spark, tmp_path):
    src = str(tmp_path / "ev_in")
    os.makedirs(src)
    # batch 1: events in hour-0 and hour-1, max event time = 1h40
    _write_events(
        f"{src}/b1.parquet",
        [(1, "click", 10), (2, "click", 20), (1, "view", HOUR + 10), (2, "view", HOUR + 2400)],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    counts = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    ckpt, out = str(tmp_path / "ckpt1"), str(tmp_path / "win_out")
    _drain(counts, out, ckpt)

    # batch 2: a LATE click into hour-0 (within the 2h watermark) and a
    # new event far ahead that advances the watermark past hour-0
    _write_events(
        f"{src}/b2.parquet",
        [(3, "click", 30), (9, "view", 9 * HOUR)],
    )
    _drain(windowed_event_counts(stream, window="1 hour", watermark="2 hours"), out, ckpt)

    # batch 3: an event for hour-0 that is now BEYOND the watermark
    # (max event time 9h, watermark 7h > hour-0 end) → dropped
    _write_events(f"{src}/b3.parquet", [(4, "click", 40)])
    _drain(windowed_event_counts(stream, window="1 hour", watermark="2 hours"), out, ckpt)

    # append mode emits a window only once it is finalized; after the
    # watermark passed hour-0, its counts include the late batch-2 row
    # but not the too-late batch-3 row
    rows = {
        (r["window_start"].hour, r["event_type"]): r["n_events"]
        for r in spark.read.parquet(out).collect()
    }
    assert rows.get((0, "click")) == 3  # 2 original + 1 late, late-beyond-watermark dropped
    assert rows.get((1, "view")) == 2


def test_sessionize_stream_gap_and_timeout(spark, tmp_path):
    src = str(tmp_path / "sess_in")
    os.makedirs(src)
    # user 1: two sessions separated by a >30min gap; user 2: one session
    _write_events(
        f"{src}/b1.parquet",
        [
            (1, "click", 0),
            (1, "click", 600),
            (1, "click", 600 + 1801 + 600),  # >1800s after previous → new session
            (2, "view", 100),
        ],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    ckpt, out = str(tmp_path / "ckpt2"), str(tmp_path / "sess_out")
    _drain(sessionize_stream(stream), out, ckpt)

    base = 1767225600  # 2026-01-01 UTC
    rows = {
        (r["user_id"], int(r["session_start"].timestamp()) - base, r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    # user 1's first session closed in-batch (explicit gap); user 2's
    # boundary (100+1800) is already behind the batch watermark (2991)
    # so the event-time timeout flushes it in the same drain; user 1's
    # OPEN second session (boundary 4802 > watermark) stays in state
    assert (1, 0, 2) in rows
    assert (2, 100, 1) in rows
    assert (1, 3001, 1) not in rows

    # a far-future event advances the watermark → the remaining idle
    # session flushes via event-time timeout (no wall-clock waits)
    _write_events(f"{src}/b2.parquet", [(9, "view", 9 * HOUR)])
    _drain(sessionize_stream(stream), out, ckpt)
    rows = {
        (r["user_id"], int(r["session_start"].timestamp()) - base, r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    assert (1, 3001, 1) in rows  # user 1's second session flushed
    assert not any(u == 9 for u, _, _ in rows)  # user 9 still open in state


def test_drain_matches_batch_twin(spark):
    """The availableNow drain of the windowed agg equals the batch
    time-bucket computation on the same input — the driver-gate
    surface (r2 verdict #9)."""
    from pyspark.sql import functions as F

    from yamlpyowl_spark.streaming.windowed import drain_windowed_event_counts

    sf = "/root/testdata/sf0.001"
    got = drain_windowed_event_counts(spark, f"{sf}/events.parquet")
    want = (
        spark.read.parquet(f"{sf}/events.parquet")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
    assert got.count() == want.count() > 0


def test_stream_dedup_drops_redeliveries(spark, tmp_path):
    """dropDuplicatesWithinWatermark removes exact re-deliveries: a
    stream with 10% duplicated events drains to the original rows."""
    from pyspark.sql import functions as F

    from yamlpyowl_spark.streaming.windowed import drain_dedup_counts

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    dup = ev.unionByName(ev.filter("event_id % 10 = 0"))
    d = str(tmp_path / "dupsrc")
    dup.write.parquet(d)
    got = {
        r["event_type"]: r["n_events"] for r in drain_dedup_counts(spark, d).collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_incremental_dedup_candidates_match_batch(spark, tmp_path):
    """Stream-static LSH: candidates for NEW docs against a static
    corpus, drained availableNow, must equal the batch lsh pairs over
    the union restricted to cross (new, old) pairs — identical band
    construction on both paths."""
    from pyspark.sql import functions as F

    from yamlpyowl_spark.operators import docops
    from yamlpyowl_spark.streaming.dedup_incremental import (
        drain_incremental_candidates,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the tall green tree near the old stone wall"
    )
    rows = []
    for i in range(30):  # corpus: ids 0-29, three near-dup families
        fam = i % 3
        rows.append((i, base + f" family{fam} " + "filler " * fam))
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])
    # new docs 100-105: near-dups of the families + one unique
    new_rows = [(100 + f, base + f" family{f} " + "filler " * f) for f in range(3)]
    new_rows.append((105, "completely different text " * 8))
    new = spark.createDataFrame(new_rows, ["doc_id", "text"])
    p = str(tmp_path / "new_docs.parquet")
    new.coalesce(1).write.parquet(p)

    got = {
        (r["new_doc_id"], r["corpus_doc_id"])
        for r in drain_incremental_candidates(spark, p, corpus).collect()
    }

    batch = docops.lsh_candidate_pairs(corpus.unionByName(new))
    expected = {
        (r["doc_b"], r["doc_a"])
        for r in batch.filter(
            (F.col("doc_a") < 100) & (F.col("doc_b") >= 100)
        ).collect()
    }
    assert got == expected
    assert got, "fixture produced no candidates — weak test"
    assert not any(n == 105 for n, _ in got)


def test_incremental_dedup_drain_empty_and_multifile(spark, tmp_path):
    """r7 drain internals (foreachBatch + parquet sink): an empty drop
    returns an empty frame with the pair schema (the seeded sink), and
    a multi-file drop yields the same candidate set as one file."""
    from pyspark.sql import functions as F

    from yamlpyowl_spark.streaming.dedup_incremental import (
        drain_incremental_candidates,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(i, base + f" tail{i % 2}") for i in range(10)], ["doc_id", "text"]
    )

    # empty drop: no input files -> seeded sink only
    d_empty = str(tmp_path / "empty_drop")
    spark.createDataFrame([], "doc_id long, text string").write.parquet(d_empty)
    out = drain_incremental_candidates(spark, d_empty, corpus)
    assert out.columns == ["new_doc_id", "corpus_doc_id"]
    assert out.count() == 0

    # multi-file drop == single-file drop (per-batch banding is
    # partition-invariant)
    new = spark.createDataFrame(
        [(100 + i, base + f" tail{i % 2}") for i in range(4)], ["doc_id", "text"]
    )
    d1 = str(tmp_path / "one_file")
    new.coalesce(1).write.parquet(d1)
    dn = str(tmp_path / "many_files")
    new.repartition(4).write.parquet(dn)
    got1 = {tuple(r) for r in drain_incremental_candidates(spark, d1, corpus).collect()}
    gotn = {tuple(r) for r in drain_incremental_candidates(spark, dn, corpus).collect()}
    assert got1 == gotn
    assert got1, "fixture produced no candidates — weak test"


def test_stateless_minhash_matches_groupby(spark):
    from yamlpyowl_spark.operators import docops

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x y z w v u t"), (3, "too short")],
        ["doc_id", "text"],
    )
    a = {tuple(r) for r in docops.minhash_signatures(docs).collect()}
    b = {tuple(r) for r in docops.minhash_signatures_stateless(docs).collect()}
    assert a == b
