"""Streaming exact dedup: within-watermark drops, horizon eviction,
batch-twin parity (kgforge/streaming/dedup.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgforge.streaming.dedup import dedup_stream


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, ts string, text string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _run_stream(spark, workdir, chunks, tag, watermark="1 hour"):
    """One file per chunk + maxFilesPerTrigger=1 so each chunk is its own
    micro-batch and the watermark advances between them."""
    src = f"{workdir}/dedup_src_{tag}"
    for i, chunk in enumerate(chunks):
        chunk.coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = dedup_stream(stream, watermark=watermark)
    q = (
        out.writeStream.format("memory")
        .queryName(f"dedup_{tag}")
        .outputMode("append")
        .option("checkpointLocation", f"{workdir}/dedup_ckpt_{tag}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(f"dedup_{tag}")


def test_duplicate_within_watermark_dropped(spark, workdir):
    chunks = [
        _docs(spark, [
            (1, "2024-01-01 10:00:00", "the quick brown fox"),
            (2, "2024-01-01 10:05:00", "an entirely different page"),
        ]),
        _docs(spark, [
            # same content as doc 1, 10 minutes later (re-crawl)
            (3, "2024-01-01 10:10:00", "The  quick  BROWN fox"),
            (4, "2024-01-01 10:20:00", "third distinct page"),
        ]),
    ]
    out = _run_stream(spark, workdir, chunks, "within")
    assert {r.doc_id for r in out.collect()} == {1, 2, 4}


def test_duplicate_past_horizon_readmitted(spark, workdir):
    chunks = [
        _docs(spark, [(1, "2024-01-01 10:00:00", "page alpha")]),
        # advances the watermark to 12:00 at this batch's close
        _docs(spark, [(2, "2024-01-01 13:00:00", "page beta")]),
        # state eviction applies in the batch AFTER the watermark passes
        # (same lag as event-time timeouts, see test_sessionize) — this
        # batch flushes doc 1's fingerprint (expiry 11:00 < 12:00)
        _docs(spark, [(3, "2024-01-01 13:10:00", "page gamma")]),
        # past the horizon: same content as doc 1, admitted again
        _docs(spark, [(4, "2024-01-01 13:30:00", "page alpha")]),
    ]
    out = _run_stream(spark, workdir, chunks, "horizon")
    assert {r.doc_id for r in out.collect()} == {1, 2, 3, 4}


def test_batch_twin_counts(spark):
    df = _docs(spark, [
        (1, "2024-01-01 10:00:00", "same text"),
        (2, "2024-01-01 10:01:00", "Same   TEXT"),
        (3, "2024-01-01 10:02:00", "other text"),
    ])
    out = dedup_stream(df)
    assert out.count() == 2
    assert set(out.columns) == {"doc_id", "ts", "text", "fp"}


def test_stream_requires_event_time_column(spark, workdir):
    src = f"{workdir}/dedup_nots"
    _docs(spark, [(1, "2024-01-01 10:00:00", "x")]).write.mode(
        "overwrite"
    ).parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .parquet(src)
        .drop("ts")
    )
    with pytest.raises(Exception):
        dedup_stream(stream)
