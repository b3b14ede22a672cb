"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

For each left row, attach the right row with the greatest ``right_ts <=
left_ts`` (or ``<`` when strict) sharing the join key: "the user's plan
at purchase time", "the latest snapshot before this crawl". pandas has
merge_asof; Spark has nothing built in, and the naive theta-join
(``l.key = r.key AND r.ts <= l.ts`` + ranked filter) explodes to one row
per (left, earlier-right) pair before pruning — quadratic per key.

Realization here is the UNION-SORT shape (linear, one shuffle): tag both
sides, union on (key, ts, side), and run ``last(right_payload,
ignorenulls=True)`` over a per-key window ordered by (ts, side) with an
unbounded-preceding frame — each left row reads the most recent right
payload carried forward past it; side-ordering at equal timestamps
encodes inclusive vs strict. One Exchange on the key, one sort, no
self-join, no row explosion.

Scale notes: the window partitions by the JOIN KEY, so a single hot key
serializes onto one task — same bound as any per-key ordered
computation. At web scale keep keys fine-grained (user, host) or
pre-split by time range at the caller; do NOT salt (order must stay
global per key). Right rows sharing (key, ts) are tie-broken by a hash
of the payload's JSON (structs with map columns cannot be sort keys),
so the result stays deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: every left row, plus the latest right row at or
    before (strict: strictly before) its timestamp, per key.

    Returns all left columns plus ``right_cols`` (default: right's
    non-key, non-ts columns) each renamed with ``suffix``, plus
    ``<right_ts><suffix>`` (the matched row's timestamp) — all NULL when
    no right row precedes the left row.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    payload = F.struct(
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    # side ordering at EQUAL ts decides inclusivity: right before left
    # (0 < 1) -> left sees it (<=); right after left (2 > 1) -> strict.
    r_side = 2 if strict else 0
    rt = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        payload.alias("__p"),
    )
    lt = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rt.schema["__p"].dataType).alias("__p"),
        F.struct(*left.columns).alias("__l"),
    )
    rt = rt.withColumn("__l", F.lit(None).cast(lt.schema["__l"].dataType))
    # tie-break among right rows sharing (key, ts): hash of the payload's
    # JSON — the struct itself cannot be a sort key when it carries a
    # map column (Spark rejects maps in ordering), and this repo's
    # payloads routinely do (props maps)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side", F.xxhash64(F.to_json("__p")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        lt.unionByName(rt)
        .withColumn("__m", F.last("__p", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"__m.{right_ts}{suffix}"))
    out_cols.extend(F.col(f"__m.{c}{suffix}") for c in right_cols)
    return matched.select(*out_cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: list[str] | str | None = None,
    bucket: int = 86_400_000_000,
) -> DataFrame:
    """Point-in-interval join via bucketization — the other join shape
    Spark lacks a fast native plan for.

    ``points.point_col BETWEEN intervals.start_col AND intervals.
    end_col`` (inclusive both ends, plus equal optional keys) naively
    compiles to BroadcastNestedLoopJoin / cartesian-filter — quadratic.
    Here both sides map to integer buckets of width ``bucket`` (numeric
    or timestamp columns; timestamps bucket on epoch micros — the
    default width is one day): each interval EXPLODES into every bucket
    it covers, each point lands in one, and the join becomes a hash
    equi-join on (keys..., bucket) re-filtered by the exact predicate.
    Linear in |points| + |interval-bucket spans|; pick ``bucket`` near
    the typical interval length so spans stay O(1).

    Returns points columns + intervals columns (inner join, one row per
    matching pair). Intervals with end < start yield nothing. Column
    name collisions (beyond the join keys) must be resolved by the
    caller beforehand.
    """
    keys = [on] if isinstance(on, str) else list(on or [])

    def to_long(name: str, df: DataFrame):
        # timestamps (LTZ and NTZ both) bucket on epoch micros; NTZ
        # casts through LTZ with the session zone — consistent across
        # all three columns, which is all bucketing needs
        if str(df.schema[name].dataType).startswith("Timestamp"):
            return F.unix_micros(F.col(name).cast("timestamp"))
        return F.col(name).cast("long")

    p_b = F.floor(to_long(point_col, points) / bucket)
    i_lo = F.floor(to_long(start_col, intervals) / bucket)
    i_hi = F.floor(to_long(end_col, intervals) / bucket)
    pt = points.withColumn("__b", p_b)
    iv = intervals.where(
        to_long(start_col, intervals) <= to_long(end_col, intervals)
    ).withColumn(
        "__b", F.explode(F.sequence(i_lo, i_hi))
    )
    joined = pt.join(iv, on=keys + ["__b"]).where(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(end_col))
    )
    return joined.drop("__b")
