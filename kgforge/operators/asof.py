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
computation. At web scale keep keys fine-grained (user, host), or pass
``time_split`` to bound the hot key IN CODE: the window key becomes
(key, time-range); per-range carry-in seeds are computed from one
summary row per (key, range) (a tiny per-key window over ranges, not
rows), so no task ever holds more than one key-range of rows. Do NOT
salt by hash (order must stay global per key). Right rows sharing
(key, ts) are tie-broken by a hash of the payload's JSON (structs with
map columns cannot be sort keys), so the result stays deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RESERVED = ("__ts", "__side", "__p", "__l", "__m", "__r")

# fixed-width range sizes in MICROSECONDS for timestamp columns; split
# balance, not correctness, depends on the boundaries, so calendar
# alignment is unnecessary ('month' = 30 days)
_SPLIT_MICROS = {
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 7 * 86_400_000_000,
    "month": 30 * 86_400_000_000,
    "year": 365 * 86_400_000_000,
}


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    strict: bool = False,
    time_split: str | int | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the latest right row at or
    before (strict: strictly before) its timestamp, per key.

    Returns all left columns plus ``right_cols`` (default: right's
    non-key, non-ts columns) each renamed with ``suffix``, plus
    ``<right_ts><suffix>`` (the matched row's timestamp) — all NULL when
    no right row precedes the left row.

    ``direction='forward'`` flips the match to the EARLIEST right row at
    or after (strict: strictly after) the left timestamp — pandas
    merge_asof parity. Realized as the identical union-sort plan on the
    negated time axis (the ordering column becomes ``-epoch_micros``),
    so every scale property (one Exchange, no row explosion, time_split
    hot-key bounding) carries over unchanged. Forward requires a
    numeric or timestamp ts column (backward accepts anything
    orderable).

    ``tolerance`` (>= 0; microseconds for timestamp columns, raw units
    for numeric ts) nulls out a match whose timestamp is farther than
    the bound from the left row's — merge_asof's tolerance. Applied as
    one post-window predicate on the matched payload, no extra shuffle.

    ``time_split`` bounds hot-key serialization: a range-width name
    ('hour'/'day'/'week'/'month'/'year', timestamp columns only) or an
    integer width (micros for timestamps, raw units for numeric ts).
    The carry-forward window then partitions by (key, range); carry-in
    state crosses range boundaries via one summary row per (key, range),
    so results are identical to the unsplit join (tested) while a hot
    key's rows spread over #ranges tasks instead of one.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}"
        )
    if tolerance is not None and tolerance < 0:
        raise ValueError("tolerance must be >= 0")

    def _is_ts(df: DataFrame, name: str) -> bool:
        return str(df.schema[name].dataType).startswith("Timestamp")

    def _as_long(col, is_ts_col: bool):
        return (
            F.unix_micros(col.cast("timestamp"))
            if is_ts_col
            else col.cast("long")
        )

    if direction == "forward":
        # forward = backward on the negated time axis: the ordering
        # column (and the time_split ranges) read -epoch_micros, while
        # payloads keep the ORIGINAL values, so outputs are untouched
        if isinstance(time_split, str):
            if time_split not in _SPLIT_MICROS:
                raise ValueError(
                    f"unknown time_split {time_split!r}; "
                    f"one of {sorted(_SPLIT_MICROS)} or an integer"
                )
            if not _is_ts(left, left_ts):
                raise ValueError(
                    "named time_split widths need a timestamp ts column; "
                    "pass an integer width for numeric timestamps"
                )
            time_split = _SPLIT_MICROS[time_split]

        def _order_key(df: DataFrame, name: str):
            return -_as_long(F.col(name), _is_ts(df, name))

    else:

        def _order_key(df: DataFrame, name: str):
            return F.col(name)
    for side_name, df in (("left", left), ("right", right)):
        hit = [c for c in _RESERVED if c in df.columns]
        if hit:
            raise ValueError(
                f"asof_join reserves column names {hit} (present in the "
                f"{side_name} frame) — rename them before joining"
            )
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
        _order_key(right, right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        payload.alias("__p"),
    )
    lt = left.select(
        *keys,
        _order_key(left, left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rt.schema["__p"].dataType).alias("__p"),
        F.struct(*left.columns).alias("__l"),
    )
    rt = rt.withColumn("__l", F.lit(None).cast(lt.schema["__l"].dataType))
    # tie-break among right rows sharing (key, ts): hash of the payload's
    # JSON — the struct itself cannot be a sort key when it carries a
    # map column (Spark rejects maps in ordering), and this repo's
    # payloads routinely do (props maps)
    tie = F.xxhash64(F.to_json("__p"))
    u = lt.unionByName(rt)
    if time_split is None:
        w = (
            Window.partitionBy(*keys)
            .orderBy("__ts", "__side", tie)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.withColumn(
            "__m", F.last("__p", ignorenulls=True).over(w)
        ).filter(F.col("__side") == 1)
    else:
        is_ts = str(u.schema["__ts"].dataType).startswith("Timestamp")
        if isinstance(time_split, str):
            if time_split not in _SPLIT_MICROS:
                raise ValueError(
                    f"unknown time_split {time_split!r}; "
                    f"one of {sorted(_SPLIT_MICROS)} or an integer"
                )
            if not is_ts:
                raise ValueError(
                    "named time_split widths need a timestamp ts column; "
                    "pass an integer width for numeric timestamps"
                )
            width = _SPLIT_MICROS[time_split]
        else:
            width = int(time_split)
        ts_long = (
            F.unix_micros(F.col("__ts").cast("timestamp"))
            if is_ts
            else F.col("__ts").cast("long")
        )
        u = u.withColumn("__r", F.floor(ts_long / width))
        # one summary row per (key, range): the right payload the
        # carry-forward would hold at range end (max by the SAME
        # (ts, side, tie) order the window uses)
        range_last = (
            u.filter(F.col("__side") != 1)
            .groupBy(*keys, "__r")
            .agg(
                F.max_by("__p", F.struct("__ts", "__side", tie)).alias("__p")
            )
        )
        # carry-in seed per (key, range): last summary from any EARLIER
        # range — a per-key window over RANGES (≤ #ranges rows per key)
        wr = (
            Window.partitionBy(*keys)
            .orderBy("__r")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        seeds = (
            u.select(*keys, "__r")
            .distinct()
            .join(range_last, [*keys, "__r"], "left")
            .withColumn("__p", F.last("__p", ignorenulls=True).over(wr))
            .filter(F.col("__p").isNotNull())
            .select(
                *keys,
                "__r",
                F.lit(None).cast(u.schema["__ts"].dataType).alias("__ts"),
                F.lit(-1).alias("__side"),
                "__p",
                F.lit(None).cast(lt.schema["__l"].dataType).alias("__l"),
            )
        )
        # seeds order first in their range: NULL ts sorts first under
        # asc_nulls_first, and side -1 precedes every real side
        w = (
            Window.partitionBy(*keys, "__r")
            .orderBy(F.col("__ts").asc_nulls_first(), "__side", tie)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = (
            u.unionByName(seeds)
            .withColumn("__m", F.last("__p", ignorenulls=True).over(w))
            .filter(F.col("__side") == 1)
        )
    if tolerance is not None:
        lts = _as_long(F.col(f"__l.{left_ts}"), _is_ts(left, left_ts))
        rts = _as_long(
            F.col(f"__m.{right_ts}{suffix}"), _is_ts(right, right_ts)
        )
        matched = matched.withColumn(
            "__m", F.when(F.abs(lts - rts) <= tolerance, F.col("__m"))
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


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    tolerance: int | None = None,
    time_split: str | int | None = None,
) -> DataFrame:
    """pandas merge_asof ``direction='nearest'`` parity: every left
    row plus whichever of its backward/forward as-of matches is closer
    in time; EXACT ties take the backward (earlier) row. `tolerance`
    is applied inside each directional join BEFORE the choice, so a
    nearer-but-out-of-tolerance match on one side never shadows an
    in-tolerance match on the other.

    Built as the backward union-sort join followed by the forward one
    over its output (the forward pass treats the backward payload as
    opaque left columns), then one row-local CASE on the two matched
    timestamps — two Exchanges total, still zero joins and no row
    explosion; `time_split` hot-key bounding flows through both
    passes. Requires a timestamp or numeric ts (the distance compare
    needs arithmetic — same restriction as forward)."""
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys + [right_ts]
        ]
    b = asof_join(
        left, right, on, left_ts=left_ts, right_ts=right_ts,
        right_cols=right_cols, suffix="__b", tolerance=tolerance,
        time_split=time_split,
    )
    f = asof_join(
        b, right, on, left_ts=left_ts, right_ts=right_ts,
        right_cols=right_cols, suffix="__f", direction="forward",
        tolerance=tolerance, time_split=time_split,
    )

    def ep(name):
        if str(f.schema[name].dataType).startswith("Timestamp"):
            return F.unix_micros(F.col(name).cast("timestamp"))
        return F.col(name).cast("long")

    bts, fts = right_ts + "__b", right_ts + "__f"
    take_b = F.col(bts).isNotNull() & (
        F.col(fts).isNull()
        | ((ep(left_ts) - ep(bts)) <= (ep(fts) - ep(left_ts)))
    )
    picked = [
        F.when(take_b, F.col(c + "__b"))
        .otherwise(F.col(c + "__f"))
        .alias(c + suffix)
        for c in right_cols + [right_ts]
    ]
    return f.select(*[F.col(c) for c in left.columns], *picked)
