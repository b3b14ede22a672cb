"""Snapshot diffing — change-data capture between two table versions.

The lakehouse audit primitive (Delta CDF / Iceberg changelog, computed
relationally): given OLD and NEW versions of a keyed table, emit one row
per changed key with the change kind and the exact set of columns that
moved. At 100 TB the point is that this is ONE full-outer join on the
key (co-partitioned both sides) + column compares in WholeStageCodegen —
never a row-by-row reconciliation loop — and its output feeds
incremental downstream refreshes (only `changed`/`added` keys re-enter
the pipeline, the `dedup_against` pattern).

Semantics: `added` (key only in NEW), `removed` (key only in OLD),
`changed` (key in both, at least one compared column differs under
NULL-SAFE comparison). Unchanged keys are dropped. ``changed_cols`` is
the comma-joined list of differing columns in the caller's column order
— a string, not an array, so cross-engine compares are trivial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str] | str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """-> (keys..., change: string, changed_cols: string).

    ``compare_cols`` defaults to all shared non-key columns. NULL-safe:
    NULL -> value and value -> NULL both count as changes; NULL -> NULL
    does not (eqNullSafe). ``keys`` must identify rows uniquely in each
    snapshot — duplicate keys fan out through the full-outer join and
    produce one diff row per old x new pairing (the same contract as
    MERGE sources)."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    if compare_cols is None:
        compare_cols = [
            c
            for c in old.columns
            if c in set(new.columns) and c not in set(key_list)
        ]
    for c in compare_cols:
        if c not in old.columns or c not in new.columns:
            raise ValueError(f"compare column {c!r} missing from a side")
    o = old.select(
        *key_list, *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__in_o"),
    )
    n = new.select(
        *key_list, *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__in_n"),
    )
    j = o.join(n, on=key_list, how="full_outer")
    diffs = [
        F.when(
            ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
        )
        for c in compare_cols
    ]
    changed_cols = F.array_join(
        F.array_compact(F.array(*diffs)) if diffs else F.array(), ","
    )
    change = (
        F.when(F.col("__in_o").isNull(), F.lit("added"))
        .when(F.col("__in_n").isNull(), F.lit("removed"))
        .when(changed_cols != "", F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .withColumn(
            "changed_cols",
            F.when(F.col("change") == "changed", changed_cols).otherwise(
                F.lit("")
            ),
        )
        .select(*key_list, "change", "changed_cols")
    )


def scd2_intervals(
    history: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Assemble SCD-type-2 validity intervals from a keyed change
    history: -> (keys..., attrs..., valid_from, valid_to, is_current).

    Input rows are observations (key, ts, attrs...) — e.g. periodic
    snapshot extracts or a CDC feed. Consecutive observations with
    identical attribute values COLLAPSE into one interval
    [valid_from, valid_to); ``valid_to`` is the next change's timestamp
    (NULL + is_current for the open interval). The standard
    gaps-and-islands build: one change-point flag via lag() under
    NULL-safe compare, a running change count (island id), then one
    aggregate per island + a lead() for the closing bound — three
    window passes over the SAME (keys, ts) sort order, so Catalyst
    plans ONE Exchange + one sort for all of them. Ties on ``ts_col``
    within a key are invalid input (two states at one instant) and
    raise — via an assert_true riding inside the change flag, so the
    check costs no extra scan and cannot be pruned.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    w = Window.partitionBy(*key_list).orderBy(ts_col)
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    first = F.lag(ts_col).over(w).isNull()
    no_tie = ~F.lag(ts_col).over(w).eqNullSafe(F.col(ts_col))
    chg_checked = F.when(
        F.isnull(
            F.assert_true(
                no_tie,
                F.lit(
                    f"duplicate {ts_col} within a key: two states at one "
                    "instant"
                ),
            )
        ),
        (first | changed).cast("int"),
    )
    flagged = history.select(
        *key_list, ts_col, *attr_cols, chg_checked.alias("__chg")
    )
    islands = flagged.withColumn(
        "__isl",
        F.sum("__chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_island = islands.groupBy(*key_list, "__isl").agg(
        F.min(ts_col).alias("valid_from"),
        *[F.first(c).alias(c) for c in attr_cols],
    )
    w2 = Window.partitionBy(*key_list).orderBy("valid_from")
    return per_island.select(
        *key_list,
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())
