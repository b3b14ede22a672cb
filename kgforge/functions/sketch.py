"""K-minimum-values (KMV) distinct-count sketch — deterministic by
construction.

The classic bottom-k theta sketch (Bar-Yossef et al. 2002): hash every
value to a uniform point in [0, 1), keep each group's k SMALLEST hash
points; the k-th point's position estimates the distinct count as
``(k - 1) / kth``. Unlike HyperLogLog (whose register layout is
engine-specific), KMV's state is just "the k smallest md5 prefixes" — a
pure function of the data, bit-identical on any engine that can md5,
which is what makes a cross-engine oracle possible AND makes sketches
from different pipeline runs safely mergeable.

Mergeability (the scale property): union of sketches = sort-merge the
hash arrays and re-cut at k. A trillion-row table sharded over 10k
partitions needs one k-array per (group, partition) flowing up — never
the raw values.

Hash space: leading 12 md5 hex chars (48 bits) — collision probability
for millions of distinct values is ~n²/2⁴⁹, negligible at sketch
accuracy; hex strings compare lexicographically == numerically at fixed
width, so the oracle needs no hex-to-int conversion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 12
_SPACE = 16 ** _HEX_DIGITS


def kmv_hash(value: Column) -> Column:
    """Uniform 12-hex point for a value (NULL -> NULL, excluded)."""
    return F.substring(
        F.md5(F.encode(value.cast("string"), "UTF-8")), 1, _HEX_DIGITS
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """-> (group..., kmv: array<string> sorted ascending, n_kept).

    Per group, the k smallest DISTINCT hash points of ``value_col``
    (NULL values excluded). ``n_kept < k`` means the group had fewer
    than k distinct values — the sketch is then EXACT (estimate ==
    n_kept). Shape: TWO-LEVEL bottom-k (the sketch's own merge algebra
    applied inside the plan): level 1 cuts each (group, input-partition)
    slice to its k smallest — per-task state is bounded by the
    partition, never by the group — then the <= k-per-partition
    survivors re-cut globally. A single collect_set over the whole group
    would materialize every distinct hash of a hot group on one task.
    Because bottom-k of bottom-ks == global bottom-k, the result is
    byte-identical to the one-level form.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if k <= 1:
        raise ValueError("k must be >= 2")
    d = df.where(F.col(value_col).isNotNull()).select(
        *groups, kmv_hash(F.col(value_col)).alias("__h")
    )
    part = (
        d.groupBy(*groups, F.spark_partition_id().alias("__pid"))
        .agg(F.slice(F.array_sort(F.collect_set("__h")), 1, k).alias("__s"))
        .select(*groups, F.explode("__s").alias("__h"))
    )
    return (
        part.groupBy(*groups)
        .agg(F.slice(F.array_sort(F.collect_set("__h")), 1, k).alias("kmv"))
        .withColumn("n_kept", F.size("kmv").cast("long"))
    )


def kmv_merge(kmv_a: Column, kmv_b: Column, k: int = 256) -> Column:
    """Merged sketch array: union, re-sort, re-cut at k. The algebra of
    the sketch — merge(sketch(A), sketch(B)) == sketch(A ∪ B)."""
    return F.slice(F.array_sort(F.array_union(kmv_a, kmv_b)), 1, k)


def kmv_estimate(kmv: Column, k: int = 256) -> Column:
    """Distinct-count estimate (long): exact size when the group kept
    fewer than k points, else ``floor((k - 1) * SPACE / kth_point)`` —
    the bottom-k estimator. Deterministic (same sketch -> same number);
    the division runs in double, which is fine for an ESTIMATOR — the
    cross-engine-exact artifacts are the sketch arrays themselves, which
    is what the oracle gate pins."""
    kth = F.element_at(kmv, k)
    # fixed-width hex -> numeric via conv (fits a long: 48 bits)
    kth_num = F.conv(kth, 16, 10).cast("long")
    return F.when(F.size(kmv) < k, F.size(kmv).cast("long")).otherwise(
        F.floor(F.lit(float((k - 1) * _SPACE)) / kth_num).cast("long")
    )
