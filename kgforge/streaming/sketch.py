"""Streaming sketch maintenance — HLL registers merged per micro-batch.

The canonical streaming-aggregation trade: exact streaming
count-distinct needs state proportional to the distinct set (and a
blocking dedup), while an HLL register table is a CRDT — per-bucket max
is commutative, associative, and idempotent — so each micro-batch can
sketch ITS OWN rows (functions/sketch.py::hll_registers, bounded at
groups x 2^p) and fold into the persisted state with the same groupBy-
max. Idempotent merge means at-least-once foreachBatch delivery is
safe WITHOUT partition-overwrite bookkeeping: replaying a batch re-maxes
the same registers and changes nothing — exactly-once by algebra, not
by sink protocol (the complement of incremental.py's batch_id
dynamic-overwrite trick, which exists because row appends are NOT
idempotent).

State lives as plain parquet at ``state_dir``; `merged_registers` reads
it back. The batch twin is ``hll_registers`` over the union of all
inputs — pytest pins stream == batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgforge.functions.sketch import hll_registers


def _merge_into_state(
    spark: SparkSession, batch_regs: DataFrame, state_dir: str,
    group_cols: list[str],
) -> None:
    keys = group_cols + ["bucket"]
    if os.path.isdir(state_dir) and any(
        f.endswith(".parquet") for f in os.listdir(state_dir)
    ):
        prev = spark.read.parquet(state_dir)
        merged = (
            prev.unionByName(batch_regs)
            .groupBy(*keys)
            .agg(F.max("max_rho").alias("max_rho"))
        )
    else:
        merged = batch_regs
    # registers are tiny (groups x 2^p); collect-and-rewrite keeps the
    # state a plain parquet dir with no table format required
    rows = merged.collect()
    out = spark.createDataFrame(rows, merged.schema) if rows else merged
    out.coalesce(1).write.mode("overwrite").parquet(state_dir)


def hll_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    state_dir: str,
    checkpoint_dir: str,
    group_cols: list[str] | str,
    value_col: str,
    p: int = 8,
    available_now: bool = True,
):
    """Maintain a grouped HLL register table over a file stream.

    Returns the StreamingQuery. Each micro-batch sketches its own rows
    and folds into ``state_dir`` by per-bucket max — replay-safe because
    max is idempotent."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        regs = hll_registers(batch_df, groups, value_col, p=p)
        _merge_into_state(batch_df.sparkSession, regs, state_dir, groups)

    writer = stream.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merged_registers(spark: SparkSession, state_dir: str) -> DataFrame:
    """Read the maintained register table back."""
    return spark.read.parquet(state_dir)


def moments_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    state_dir: str,
    checkpoint_dir: str,
    group_cols: list[str] | str,
    value_col: str,
    scale: int = 100,
    available_now: bool = True,
):
    """Maintain grouped moments-sketch partials over a file stream.

    The additive complement of `hll_stream`: moment sums MERGE by
    addition, which is NOT idempotent — a replayed micro-batch would
    double-count — so exactly-once comes from the OTHER standing trick
    (streaming/incremental.py): each batch writes its own partial rows
    into a ``batch_id=N`` partition with dynamic partition overwrite.
    Redelivery rewrites the same partition with the same rows; the
    read-time `merged_moments` re-aggregation (one `moments_merge` over
    the tiny partial table) never sees duplicates. Returns the
    StreamingQuery."""
    from kgforge.functions.sketch import moments_sketch

    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        partial = moments_sketch(batch_df, groups, value_col, scale=scale)
        (
            partial.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(state_dir)
        )

    writer = stream.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merged_moments(
    spark: SparkSession, state_dir: str, group_cols: list[str] | str
) -> DataFrame:
    """Fold the per-batch partials to the final per-key sketch."""
    from kgforge.functions.sketch import moments_merge

    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    return moments_merge(spark.read.parquet(state_dir), groups)
