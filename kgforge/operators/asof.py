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
global per key). Right rows sharing (key, ts) are tie-broken by the
payload struct's ordering, so the result stays deterministic.
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
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side", "__p")
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
