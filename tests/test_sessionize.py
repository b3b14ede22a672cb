"""Stateful streaming sessionization (applyInPandasWithState) vs the batch
twin: closed-session parity, watermark-gated emission, late-data bridging."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kgforge.streaming.sessionize import session_agg, sessionize_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    """rows: (user_id, minutes_offset, event_id)."""
    return spark.createDataFrame(
        [
            (u, T0 + dt.timedelta(minutes=m), e)
            for u, m, e in rows
        ],
        "user_id long, ts timestamp, event_id long",
    )


def _run_stream(spark, workdir, chunks, tag):
    """Write each chunk as one file, stream with maxFilesPerTrigger=1 so
    every chunk is its own micro-batch (watermark advances between them),
    collect the append-mode sink."""
    src = f"{workdir}/sess_src_{tag}"
    for i, chunk in enumerate(chunks):
        chunk.coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = sessionize_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(f"sessions_{tag}")
        .outputMode("append")
        .option("checkpointLocation", f"{workdir}/sess_ckpt_{tag}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(f"sessions_{tag}")


def test_closed_sessions_match_batch(spark, workdir):
    """Sessions the watermark has passed are emitted exactly once and
    match the batch twin's (start, end, count) rows."""
    early = _events(
        spark,
        [
            (1, 0, 1), (1, 10, 2), (1, 20, 3),   # session A: 0..20, 3 events
            (1, 120, 4),                          # session B: 120, 1 event
            (2, 5, 5),                            # session C: 5, 1 event
        ],
    )
    # a far-future event pushes the watermark (2h default) past everything;
    # a SECOND far-future batch is needed because event-time timeouts fire
    # in the batch AFTER the watermark advances past them
    late = _events(spark, [(9, 60 * 24, 99)])
    late2 = _events(spark, [(9, 60 * 24 + 1, 100)])
    got = _run_stream(spark, workdir, [early, late, late2], "parity")
    rows = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in got.collect()
    }
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in session_agg(
            early.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
        ).collect()
    }
    assert rows == batch
    assert len(rows) == 3


def test_open_sessions_are_held_back(spark, workdir):
    """A session the watermark has NOT passed stays in state (no row)."""
    chunk = _events(spark, [(1, 0, 1), (1, 10, 2)])
    got = _run_stream(spark, workdir, [chunk], "open")
    # single micro-batch: watermark is still at batch start -> nothing closes
    assert got.count() == 0


def test_late_event_bridges_sessions(spark, workdir):
    """An out-of-order event landing between two provisional sessions
    (within the watermark) merges them — the stateful operator handles
    what append-only batch numbering cannot."""
    c1 = _events(spark, [(1, 0, 1), (1, 50, 2)])   # 50min gap: 2 sessions
    c2 = _events(spark, [(1, 25, 3)])              # late: bridges 0 and 50
    closer = _events(spark, [(9, 60 * 24, 99)])
    closer2 = _events(spark, [(9, 60 * 24 + 1, 100)])
    got = _run_stream(spark, workdir, [c1, c2, closer, closer2], "bridge")
    rows = [
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in got.filter(F.col("user_id") == 1).collect()
    ]
    assert rows == [
        (1, T0, T0 + dt.timedelta(minutes=50), 3)
    ]


def test_batch_twin_counts(spark):
    ev = _events(
        spark,
        [(1, 0, 1), (1, 29, 2), (1, 60, 3), (2, 0, 4)],
    )
    rows = {
        (r.user_id, r.n_events)
        for r in session_agg(ev).collect()
    }
    # 29min <= gap keeps events together; 31min to the next starts a new one
    assert rows == {(1, 2), (1, 1), (2, 1)}
