"""Deterministic corpus sharding: hash splits and token-budget shards.

Engine-new surface: the last mile of a training-data pipeline is handing
the curated corpus to a trainer as (a) reproducible train/val/test splits
and (b) size-bounded shards. Both must be DETERMINISTIC functions of the
data — rerunning the pipeline, on any cluster size, must produce the same
assignment — so neither uses randomness or physical partitioning as an
input.

- `hash_split` assigns each row a split label from the leading hex of an
  md5 over (salt, key): portable across engines (DuckDB md5 matches, the
  threshold compare is plain string order on lowercase hex), stable under
  repartitioning, and salt-switchable for re-rolls.
- `token_shards` assigns each doc the shard `floor(prior_running_tokens /
  budget)` in key order — the deterministic token-offset sharding a
  trainer consumes. The global running sum is computed as a SCALE-SAFE
  two-phase scan (the classic distributed prefix-sum): range-repartition
  by key, per-partition totals hop to the driver (one row per partition —
  metadata scale), each partition then windows locally against its
  broadcast prefix. No `Window.orderBy` without a partition key anywhere
  — that plan collapses 100 TB onto one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HEX_SPACE = 16 ** 8  # the split compare reads the first 8 md5 hex chars


def split_bounds(
    splits: list[tuple[str, int]],
) -> list[tuple[str, str]]:
    """(label, integer weight) list -> (exclusive upper 8-hex bound,
    label) cumulative thresholds — shared by the Spark expression and
    any SQL twin so both compare against identical literals."""
    total = sum(w for _, w in splits)
    if total <= 0 or any(w < 0 for _, w in splits):
        raise ValueError("split weights must be non-negative, sum > 0")
    out, acc = [], 0
    for name, w in splits:
        acc += w
        out.append((format(acc * _HEX_SPACE // total, "08x"), name))
    return out


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    splits: list[tuple[str, int]] | None = None,
    salt: str = "kgforge",
    out_col: str = "split",
) -> DataFrame:
    """Add a deterministic split label keyed on md5(salt || key).

    Integer weights (e.g. [("train", 98), ("val", 1), ("test", 1)])
    keep the thresholds exact; the last split absorbs the rounding
    remainder. The hash is over the KEY, not the row position, so the
    assignment survives filtering, repartitioning, and re-runs; change
    `salt` to re-roll. Expected fractions are weights/total — exact only
    in expectation (md5 is uniform), like any hash split.
    """
    splits = splits or [("train", 98), ("val", 1), ("test", 1)]
    if isinstance(splits, dict):  # {'train': 98, ...} reads naturally
        splits = list(splits.items())
    bounds = split_bounds(splits)
    h = F.substring(
        F.md5(F.encode(F.concat(F.lit(salt), F.col(key_col).cast("string")),
                       "UTF-8")),
        1, 8,
    )
    # forward order: the first (smallest) threshold wins
    c = None
    for bound, name in bounds[:-1]:
        c = (F.when(h < F.lit(bound), F.lit(name)) if c is None
             else c.when(h < F.lit(bound), F.lit(name)))
    c = F.lit(bounds[-1][1]) if c is None else c.otherwise(
        F.lit(bounds[-1][1])
    )
    return df.withColumn(out_col, c)


def token_shards(
    df: DataFrame,
    budget: int,
    key_col: str = "doc_id",
    weight_col: str = "n_tokens",
    out_col: str = "shard",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign shard = floor(prior running weight / budget) in key order.

    A doc lands in the shard where its FIRST token falls; a doc larger
    than the budget still gets one shard (trainers split residuals
    downstream). The running sum is a distributed prefix-sum: partition
    boundaries (range partitioner samples) do NOT affect the result —
    only the key order does — so the output is deterministic on any
    cluster layout. NULL weights count as 0.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    w = F.coalesce(F.col(weight_col).cast("long"), F.lit(0))
    # materialize ONCE: the range partitioner picks its bounds by
    # sampling, and phase 1 (totals) and phase 2 (local windows) must
    # see the SAME row->partition assignment — two lazy evaluations can
    # sample different bounds and silently mis-prefix. (The RESULT is
    # still partitioning-independent; only the two phases' internal
    # view must agree.)
    parts = (
        df.repartitionByRange(n, F.col(key_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # phase 1: per-partition totals -> driver (one row per partition)
    totals = sorted(
        parts.groupBy("__pid").agg(F.sum(w).alias("__t")).collect(),
        key=lambda r: r["__pid"],
    )
    prefix, acc = [], 0
    for r in totals:
        prefix.append((r["__pid"], acc))
        acc += r["__t"] or 0
    pref_df = spark.createDataFrame(prefix, "__pid int, __prefix long")
    # phase 2: local window per partition + broadcast prefix offset
    win = Window.partitionBy("__pid").orderBy(key_col)
    return (
        parts.join(F.broadcast(pref_df), on="__pid")
        .withColumn(
            "__run", F.sum(w).over(win) - w + F.col("__prefix")
        )
        .withColumn(out_col, F.floor(F.col("__run") / budget).cast("long"))
        .drop("__pid", "__prefix", "__run")
    )
