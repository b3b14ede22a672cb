"""Streaming change detection — the CUSUM recurrence as a stateful
streaming operator (SURVEY §2.9 family; batch twin:
functions/rollup.py::cusum_stats, gate events_cusum).

CUSUM is ORDER-DEPENDENT (S_i = max(0, S_{i-1} + a_i)), so unlike the
sessionizer's order-insensitive interval merge it cannot fold events on
arrival: a late event would have to be retro-inserted mid-recurrence.
The operator therefore buffers per-key events in state and folds them
only once the event-time watermark has passed them — at that point no
in-order-enough arrival can precede them, and the fold order (ts, id)
is exactly the batch gate's sort. Within each fold the sequential
recurrence is the same prefix-sum closed form the batch operator uses,
with carried state:

    Q_i  = q0 + cumsum(a)               (q0  = carried prefix)
    m_i  = min(qmin0, runningmin Q_i)   (qmin0 = carried min(0, prefix))
    S_i  = Q_i - m_i

two numbers of carried state replay the whole history — numpy-vector
per batch, no per-row Python loop.

Emission ("update"-style over append mode): one summary row
(key, n, n_alarms, max_stat, first_alarm_rn) per key per trigger THAT
FOLDED events — the latest row per key (largest n) is the current
detector state; an event-time timeout flushes the tail buffer when the
watermark passes it with no new arrivals. At scale, state per key is
two prefix integers + the not-yet-releasable buffer (bounded by the
watermark delay x per-key event rate), and the stream shuffles once on
the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("n", LongType()),
        StructField("n_alarms", LongType()),
        StructField("max_stat", LongType()),
        StructField("first_alarm_rn", LongType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("q", LongType()),
        StructField("qmin", LongType()),
        StructField("n", LongType()),
        StructField("n_alarms", LongType()),
        StructField("max_stat", LongType()),
        StructField("first_rn", LongType()),
        StructField("buf_ts", ArrayType(LongType())),
        StructField("buf_id", ArrayType(LongType())),
        StructField("buf_a", ArrayType(LongType())),
    ]
)


def cusum_stream(
    events: DataFrame,
    drift_cents: int = 10_000,
    threshold_cents: int = 30_000,
    watermark: str = "2 hours",
) -> DataFrame:
    """events(user_id, event_id, ts, value) STREAM -> running CUSUM
    summaries per user (the events_cusum gate's columns). Works only on
    streaming DataFrames; `cusum_stats` is the batch twin producing the
    identical final row per key for a fully-materialized input."""
    import numpy as np  # noqa: F401  (worker-side)
    import pandas as pd  # noqa: F401

    drift = int(drift_cents)
    thresh = int(threshold_cents)

    def fn(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        (user_id,) = key
        if state.exists:
            q, qmin, n, n_alarms, max_stat, first_rn, bt, bi, ba = state.get
            bt, bi, ba = list(bt), list(bi), list(ba)
        else:
            q, qmin, n, n_alarms, max_stat, first_rn = 0, 0, 0, 0, 0, None
            bt, bi, ba = [], [], []

        for pdf in pdfs:
            if not len(pdf):
                continue
            # pandas int64 view of a ts column is NANOSECONDS
            bt.extend((pdf["ts"].astype("int64") // 1000).tolist())
            bi.extend(pdf["event_id"].astype("int64").tolist())
            ba.extend(
                (
                    pdf["value"].mul(100).round().astype("int64") - drift
                ).tolist()
            )

        wm_us = state.getCurrentWatermarkMs() * 1000
        ts_a = np.asarray(bt, dtype=np.int64)
        release = ts_a < wm_us
        folded = bool(release.any())
        if folded:
            id_a = np.asarray(bi, dtype=np.int64)
            a_a = np.asarray(ba, dtype=np.int64)
            rts, rid, ra = ts_a[release], id_a[release], a_a[release]
            order = np.lexsort((rid, rts))
            qs = q + np.cumsum(ra[order])
            m = np.minimum(np.minimum.accumulate(qs), qmin)
            s = qs - m
            alarms = s > thresh
            if first_rn is None and alarms.any():
                first_rn = n + int(np.argmax(alarms)) + 1
            n_alarms += int(alarms.sum())
            max_stat = max(max_stat, int(s.max()))
            n += len(s)
            q, qmin = int(qs[-1]), int(m[-1])
            keep = ~release
            bt = ts_a[keep].tolist()
            bi = id_a[keep].tolist()
            ba = a_a[keep].tolist()

        state.update(
            (q, qmin, n, n_alarms, max_stat, first_rn, bt, bi, ba)
        )
        if bt:
            # flush the tail when the watermark passes the newest
            # buffered event even if no further data arrives
            state.setTimeoutTimestamp(max(bt) // 1000 + 1)
        if folded:
            yield pd.DataFrame(
                {
                    "key": [user_id],
                    "n": [n],
                    "n_alarms": [n_alarms],
                    "max_stat": [max_stat],
                    "first_alarm_rn": [first_rn],
                }
            )

    events = events.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            _OUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
