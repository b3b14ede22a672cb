"""Explicit skew handling: heavy-hitter detection, salted aggregation,
salted broadcast-replicated joins (SURVEY §4).

The reference has no skew story: a hot entity ("United States") is a hot
FalkorDB node whose MERGEs serialize
(/root/reference/graphrag_sdk/steps/extract_data_step.py:222). At 10^12
documents a hot node key is a hot shuffle key; AQE's skew-join splitting
(enabled in session.py) covers sort-merge joins, but aggregations over a
Zipf-headed key column still funnel one key into one reducer. These helpers
make the salting explicit:

- `heavy_hitters`: cheap pre-pass that finds keys above a frequency cut
  (this is a full groupBy-count on the key column only — map-side partial
  aggregation makes it one narrow shuffle of distinct keys).
- `salted_agg`: two-phase aggregate — salt hot keys into `factor` subkeys,
  partial-aggregate per (key, salt), then merge the partials. Cold keys get
  salt 0 and skip straight through; results are exactly equal to the
  unsalted aggregate (verified against the DuckDB oracle in
  driver_queries.py::skew_salted_agg).
- `replicate_broadcast_join`: the salted-join realization for joining a
  skewed fact side against a dimension: replicate the dimension row for
  every salt bucket of its hot keys; fact rows pick a deterministic salt
  (hash-pmod, seed-free) so the join stays an equi-join on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame, key_cols: list[str], min_count: int = 100_000
) -> DataFrame:
    """Keys whose row count exceeds min_count -> (key_cols..., hh_count)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("hh_count"))
        .filter(F.col("hh_count") >= min_count)
    )


def _salt_col(cols: list[str], factor: int) -> Column:
    """Deterministic salt in [0, factor) from non-key columns (seed-free)."""
    return F.pmod(F.xxhash64(*cols), F.lit(factor))


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: list,
    merge_aggs: list,
    hot_keys: DataFrame | None = None,
    factor: int = 16,
    salt_source: list[str] | None = None,
) -> DataFrame:
    """Two-phase (salted) aggregation equal to df.groupBy(keys).agg(...).

    partial_aggs: aggregate Columns for phase 1 (per key+salt), each aliased;
    merge_aggs:   aggregate Columns for phase 2 re-combining phase-1 aliases.
    hot_keys:     optional (key_cols..) DataFrame from `heavy_hitters`; when
                  given, only those keys are salted (broadcast semi-lookup)
                  and cold keys take salt 0 — one shuffle row per cold key.
    salt_source:  columns feeding the deterministic salt hash (default: all
                  non-key columns).
    """
    salt_source = salt_source or [c for c in df.columns if c not in key_cols]
    salt = _salt_col(salt_source, factor)
    if hot_keys is not None:
        marked = df.join(
            F.broadcast(hot_keys.select(*key_cols, F.lit(True).alias("_hot"))),
            on=key_cols,
            how="left",
        )
        salted = marked.withColumn(
            "_salt", F.when(F.col("_hot").isNotNull(), salt).otherwise(F.lit(0))
        ).drop("_hot")
    else:
        salted = df.withColumn("_salt", salt)
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*merge_aggs)


def replicate_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    hot_keys: DataFrame,
    factor: int = 16,
    how: str = "inner",
) -> DataFrame:
    """fact ⋈ dim on key_cols with hot keys spread over `factor` buckets.

    dim rows for hot keys are replicated once per salt value (explode over a
    0..factor-1 sequence); fact rows hash into one bucket. The join is then
    an equi-join on (key_cols..., _salt) with no single reducer receiving a
    whole hot key. dim is expected to be the smaller side (it is broadcast).
    """
    hot = F.broadcast(hot_keys.select(*key_cols, F.lit(True).alias("_hot")))
    fact_s = (
        fact.join(hot, on=key_cols, how="left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_hot").isNotNull(),
                _salt_col([c for c in fact.columns if c not in key_cols], factor),
            ).otherwise(F.lit(0)),
        )
        .drop("_hot")
    )
    dim_s = (
        dim.join(hot, on=key_cols, how="left")
        .withColumn(
            "_salts",
            F.when(
                F.col("_hot").isNotNull(),
                F.sequence(F.lit(0), F.lit(factor - 1)),
            ).otherwise(F.array(F.lit(0))),
        )
        .withColumn("_salt", F.explode("_salts"))
        .drop("_hot", "_salts")
    )
    return fact_s.join(
        F.broadcast(dim_s), on=key_cols + ["_salt"], how=how
    ).drop("_salt")
