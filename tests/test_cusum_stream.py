"""Streaming CUSUM (watermark-buffered, event-time-ordered fold) vs the
batch closed form: final-summary parity, out-of-order folding, and the
held-back-buffer guarantee."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kgforge.streaming.detect import cusum_stream
from kgforge.functions.rollup import cusum_stats

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    """rows: (user_id, minutes_offset, event_id, value)."""
    return spark.createDataFrame(
        [
            (u, T0 + dt.timedelta(minutes=m), e, float(v))
            for u, m, e, v in rows
        ],
        "user_id long, ts timestamp, event_id long, value double",
    )


def _run_stream(spark, workdir, chunks, tag, **kw):
    src = f"{workdir}/cusum_src_{tag}"
    for i, chunk in enumerate(chunks):
        chunk.coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
    stream = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = cusum_stream(stream, **kw)
    q = (
        out.writeStream.format("memory")
        .queryName(f"cusum_{tag}")
        .outputMode("append")
        .option("checkpointLocation", f"{workdir}/cusum_ckpt_{tag}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(f"cusum_{tag}")


def _final_rows(table):
    """Latest summary per key = the row with the largest n."""
    out = {}
    for r in table.collect():
        if r.key not in out or r.n > out[r.key].n:
            out[r.key] = r
    return {
        k: (r.n, r.n_alarms, r.max_stat, r.first_alarm_rn)
        for k, r in out.items()
    }


def test_stream_matches_batch_closed_form(spark, workdir):
    # drift 10000 cents: values around 100.0 are neutral; a run of
    # 180.0 values drives S up 8000/event -> alarm at 15000 after 2
    data = [
        (1, 0, 1, 100.0), (1, 10, 2, 180.0), (1, 20, 3, 180.0),
        (1, 30, 4, 180.0), (1, 40, 5, 20.0),
        (2, 0, 6, 50.0), (2, 10, 7, 60.0),
    ]
    early = _events(spark, data)
    # two far-future pushes: watermark advance + the timeout that fires
    # in the batch AFTER it (their own rows stay buffered, never folded)
    late = _events(spark, [(9, 60 * 24, 99, 100.0)])
    late2 = _events(spark, [(9, 60 * 24 + 1, 100, 100.0)])
    got = _final_rows(
        _run_stream(
            spark, workdir, [early, late, late2], "p",
            threshold_cents=15_000,
        )
    )
    batch = {
        r.key: (r.n, r.n_alarms, r.max_stat, r.first_alarm_rn)
        for r in cusum_stats(
            _events(spark, data).withColumn(
                "ts", F.col("ts").cast("timestamp_ltz")
            ),
            threshold_cents=15_000,
        ).collect()
    }
    assert got == batch
    assert got[1][1] > 0 and got[1][3] is not None  # alarms non-vacuous


def test_out_of_order_within_watermark_folds_in_event_time(spark, workdir):
    # event 3 (t=20) arrives in a LATER file than event 5 (t=40); the
    # watermark buffer must still fold 3 before 5.
    c1 = _events(spark, [(1, 0, 1, 180.0), (1, 40, 5, 20.0)])
    c2 = _events(spark, [(1, 20, 3, 180.0)])
    late = _events(spark, [(9, 60 * 24, 99, 100.0)])
    late2 = _events(spark, [(9, 60 * 24 + 1, 100, 100.0)])
    got = _final_rows(
        _run_stream(
            spark, workdir, [c1, c2, late, late2], "ooo",
            threshold_cents=15_000,
        )
    )
    ordered = [(1, 0, 1, 180.0), (1, 20, 3, 180.0), (1, 40, 5, 20.0)]
    batch = {
        r.key: (r.n, r.n_alarms, r.max_stat, r.first_alarm_rn)
        for r in cusum_stats(
            _events(spark, ordered).withColumn(
                "ts", F.col("ts").cast("timestamp_ltz")
            ),
            threshold_cents=15_000,
        ).collect()
    }
    assert got[1] == batch[1]


def test_unreleased_buffer_emits_nothing(spark, workdir):
    # single micro-batch: watermark still at epoch -> everything buffered
    got = _run_stream(
        spark, workdir, [_events(spark, [(1, 0, 1, 180.0)])], "held"
    )
    assert got.count() == 0
