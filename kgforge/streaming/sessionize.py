"""Stateful gap-based sessionization (SURVEY §2.9, engine-new).

The batch face (`w2_sessionize_events`, driver_queries.py) numbers events
into sessions with window functions; this module adds the true streaming
face: a custom stateful operator over `applyInPandasWithState` that
maintains per-user OPEN sessions and emits one row per CLOSED session —
closed meaning the event-time watermark has passed `session_end + gap`, so
no in-order-enough late event can extend it. This is the
"applyInPandasWithState custom stateful operator" pattern the reference has
no analogue for (its ingestion is batch re-runs, ref kg.py:88-106).

Semantics:

- state per user = the set of open sessions as parallel arrays
  (start_us, end_us, n_events); merged greedily: an incoming event lands in
  a session when it is within `gap` of it, and sessions that touch after
  extension merge (count-preserving interval sweep). Order-insensitive —
  late events within the watermark land in (or bridge) the right sessions,
  which the append-only batch numbering cannot do.
- emission is exactly the finalized-session stream: a session row leaves
  the operator once, when the watermark guarantees closure. An event-time
  timeout is registered at `min(open ends) + gap` so closure fires even
  when a user receives no further events.
- at 100 TB scale state is per-user-bounded (open sessions only — closed
  ones leave state immediately), the groupBy shuffles once on user_id, and
  the Arrow batch transfer amortizes the Python hop.

`session_agg` is the batch twin producing identical (user, start, end,
count) rows for fully-materialized inputs; the driver gate hash-checks it
against a DuckDB oracle, and tests/test_sessionize.py proves
stream-vs-batch parity on closed sessions plus late-data bridging.
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
    TimestampType,
)

_GAP_US_DEFAULT = 1_800_000_000  # 30 minutes, the w2 batch-gate gap

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("starts", ArrayType(LongType())),
        StructField("ends", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
    ]
)


def _merge_sessions(sessions: list, gap_us: int) -> list:
    """Count-preserving interval sweep: sort by start, merge any pair
    within `gap_us` of touching."""
    sessions.sort()
    merged: list[list] = []
    for s, e, n in sessions:
        if merged and s <= merged[-1][1] + gap_us:
            merged[-1][1] = max(merged[-1][1], e)
            merged[-1][2] += n
        else:
            merged.append([s, e, n])
    return merged


def sessionize_stream(
    events: DataFrame,
    gap_us: int = _GAP_US_DEFAULT,
    watermark: str = "2 hours",
) -> DataFrame:
    """events(user_id, ts, ...) stream -> closed-session rows
    (user_id, session_start, session_end, n_events).

    Works only on streaming DataFrames (applyInPandasWithState requires
    one); `session_agg` is the batch twin.
    """
    import pandas as pd  # noqa: F401  (worker-side)

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        sessions = (
            [list(t) for t in zip(*state.get)] if state.exists else []
        )
        for pdf in pdfs:
            ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us
            for t in ts_us:
                sessions.append([int(t), int(t), 1])
        sessions = _merge_sessions(sessions, gap_us)

        wm_us = state.getCurrentWatermarkMs() * 1000
        closed = [s for s in sessions if s[1] + gap_us < wm_us]
        open_ = [s for s in sessions if s[1] + gap_us >= wm_us]

        if open_:
            state.update(
                (
                    [s[0] for s in open_],
                    [s[1] for s in open_],
                    [s[2] for s in open_],
                )
            )
            # fire again when the watermark can close the earliest session
            state.setTimeoutTimestamp(
                min(s[1] for s in open_) // 1000 + gap_us // 1000 + 1
            )
        else:
            state.remove()

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": pd.to_datetime(
                        [s[0] for s in closed], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [s[1] for s in closed], unit="us"
                    ),
                    "n_events": [s[2] for s in closed],
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


def session_agg(events: DataFrame, gap_us: int = _GAP_US_DEFAULT) -> DataFrame:
    """Batch twin: aggregate events into (user_id, session_start,
    session_end, n_events) with the same gap rule — w2's session numbering
    followed by a per-session aggregate. Pure window + groupBy plan
    (one shuffle on user_id, reused by both steps)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr("timestampdiff(MICROSECOND, _prev_ts, ts)")
    is_new = F.when(gap.isNull() | (gap > gap_us), F.lit(1)).otherwise(
        F.lit(0)
    )
    return (
        events.withColumn("_prev_ts", F.lag("ts").over(w))
        .withColumn("is_new", is_new)
        .withColumn(
            "session_idx",
            F.sum("is_new")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )
