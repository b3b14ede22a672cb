"""Watermarked stream-stream interval join: event attribution.

The remaining cell of the Structured-Streaming feature matrix
(stateless maps: curate_stream; watermarked dedup: dedup_stream;
windowed aggs: windowed_event_rollup; arbitrary state: sessionize_
stream; exactly-once batch reuse: stream_extract) — a JOIN between two
streams. The pattern is conversion attribution: match each conversion
event to every trigger event by the same user that happened within a
look-back horizon (clicks -> purchases, impressions -> signups).

Spark semantics this leans on (public Structured Streaming contract):
a stream-stream inner join needs BOTH sides watermarked plus a
time-range join condition, so the state store can evict a trigger once
the conversion-side watermark passes trigger_ts + horizon — state is
bounded by (horizon + watermark delay) x arrival rate, never by stream
length. The same function on batch inputs compiles to a plain
range-condition equi-join: `attribute_batch` IS the oracle twin the
driver gate checks (events_attribution), and the stream/batch parity
test replays identical rows through both paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute(
    triggers: DataFrame,
    conversions: DataFrame,
    horizon: str = "2 hours",
    watermark: str = "1 hour",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """-> (key, trig_id, conv_id, lag_us): every (trigger, conversion)
    pair with the same key where the conversion lands in
    (trigger_ts, trigger_ts + horizon]. `lag_us` is the exact
    microsecond gap (BIGINT — cross-engine hashable).

    Streaming inputs: both sides get `watermark`; the time-range
    condition bounds the join state as described in the module
    docstring. Batch inputs: the identical join without watermarks.
    Strictly-positive lag (a conversion at the exact trigger timestamp
    is NOT attributed — simultaneous events are not causal).
    """
    t = triggers.select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("trig_id"),
        F.col(ts_col).cast("timestamp").alias("trig_ts"),
    )
    c = conversions.select(
        F.col(key_col).alias("c_key"),
        F.col(id_col).alias("conv_id"),
        F.col(ts_col).cast("timestamp").alias("conv_ts"),
    )
    if t.isStreaming or c.isStreaming:
        t = t.withWatermark("trig_ts", watermark)
        c = c.withWatermark("conv_ts", watermark)
    joined = t.join(
        c,
        (F.col("key") == F.col("c_key"))
        & (F.col("conv_ts") > F.col("trig_ts"))
        & (
            F.col("conv_ts")
            <= F.col("trig_ts") + F.expr(f"INTERVAL {horizon}")
        ),
    )
    return joined.select(
        "key",
        "trig_id",
        "conv_id",
        (
            F.unix_micros(F.col("conv_ts"))
            - F.unix_micros(F.col("trig_ts"))
        ).alias("lag_us"),
    )
