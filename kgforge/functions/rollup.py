"""Hypertable-style rollup cascade (continuous-aggregate hierarchy).

The TimescaleDB/Druid pattern: maintain hour -> day -> month aggregate
tables where each coarser level re-aggregates the FINER level's
partials, never the raw events. At 100 TB that is the difference between
a monthly report scanning 30 daily partials per key and re-scanning a
trillion raw rows; it also makes the levels mutually consistent by
construction.

Correct aggregate-of-aggregates composition (the part people get wrong):
count re-aggregates by SUM, sum by SUM, min by MIN, max by MAX; avg is
NOT re-aggregatable — it derives as total/n at read time. Sums run in
DECIMAL so the cascade is bit-exact regardless of re-aggregation order
(the repo's standing float-sum rule); the oracle gate pins the DEEPEST
level against a direct-from-raw aggregate, proving the cascade loses
nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rollup_cascade(
    events: DataFrame,
    levels: tuple[str, ...] = ("hour", "day", "month"),
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> dict[str, DataFrame]:
    """-> {level: DataFrame(bucket, *key_cols, n, total, vmin, vmax)}.

    ``levels`` are `date_trunc` units ordered fine -> coarse; the first
    aggregates the raw events, every later one re-aggregates its
    predecessor's partials. Each level is one map-side-combining
    hash aggregate over the (already tiny) previous level.
    """
    if not levels:
        raise ValueError("need at least one level")
    # only units that NEST compose: a week straddles month/quarter/year
    # boundaries (and ISO weeks straddle years), so re-aggregating week
    # partials into any coarser unit silently miscounts boundary events
    # — 'week' is only legal as the LAST level
    nesting = ["second", "minute", "hour", "day", "month", "quarter",
               "year"]
    for fine, coarse in zip(levels, levels[1:]):
        if fine == "week":
            raise ValueError(
                "'week' does not nest into coarser units (weeks straddle "
                "month/year boundaries) — it may only be the last level"
            )
        if fine in nesting and coarse in nesting and (
            nesting.index(fine) >= nesting.index(coarse)
        ):
            raise ValueError(
                f"levels must go fine -> coarse, got {fine!r} before "
                f"{coarse!r}"
            )
    keys = list(key_cols)
    cur = (
        events.groupBy(
            F.date_trunc(levels[0], F.col(ts_col)).alias("bucket"), *keys
        ).agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("total"),
            F.min(value_col).alias("vmin"),
            F.max(value_col).alias("vmax"),
        )
    )
    out = {levels[0]: cur}
    for lvl in levels[1:]:
        cur = (
            cur.groupBy(
                F.date_trunc(lvl, F.col("bucket")).alias("bucket"), *keys
            ).agg(
                F.sum("n").cast("long").alias("n"),
                F.sum("total").alias("total"),
                F.min("vmin").alias("vmin"),
                F.max("vmax").alias("vmax"),
            )
        )
        out[lvl] = cur
    return out


def gapfill_locf(
    events: DataFrame,
    step_us: int = 3_600_000_000,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    max_buckets: int = 2_000_000,
) -> DataFrame:
    """Regular-grid gap-fill + last-observation-carried-forward.

    The TimescaleDB ``time_bucket_gapfill(..) + locf(..)`` operator: per
    key, every ``step_us`` bucket between that key's first and last
    event exists in the output — missing buckets get ``n = 0``,
    ``total = NULL``, ``is_gap = true``, and ``total_locf`` carries the
    last observed total forward. Buckets are epoch-microsecond ints via
    exact modulo arithmetic (never float division, which can tip across
    a bucket boundary differently per engine); totals are DECIMAL sums.

    Scale shape: the aggregate is map-side combining; the grid comes
    from ONE row per key (min/max) exploded via ``sequence`` —
    ``max_buckets`` bounds that row's array (raise, not truncate: a
    silent cut would fake data). The LOCF window is per-key sequential;
    for a multi-year hot key at second granularity, coarsen ``step_us``
    or pre-split the key by range like ``asof_join(time_split=...)``.
    """
    step = int(step_us)
    if step <= 0:
        raise ValueError("step_us must be positive")
    keys = list(key_cols)
    m = F.unix_micros(F.col(ts_col).cast("timestamp"))
    agg = (
        events.select(
            *keys,
            (m - m % step).alias("bucket_us"),
            F.col(value_col).cast("decimal(18,6)").alias("__v"),
        )
        .groupBy(*keys, "bucket_us")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("__v").alias("total"),
        )
    )
    span = agg.groupBy(*keys).agg(
        F.min("bucket_us").alias("__lo"), F.max("bucket_us").alias("__hi")
    )
    # assert_true rides inside the sequence START bound so it cannot be
    # pruned: the guard evaluates (and throws on an oversized span)
    # before any grid row materializes
    ok = ((F.col("__hi") - F.col("__lo")) / F.lit(step)) < F.lit(max_buckets)
    lo_checked = F.when(
        F.isnull(
            F.assert_true(ok, F.lit(f"gapfill grid exceeds {max_buckets} buckets for a key — coarsen step_us or split the key"))
        ),
        F.col("__lo"),
    )
    grid = span.select(
        *keys,
        F.explode(F.sequence(lo_checked, F.col("__hi"), F.lit(step))).alias(
            "bucket_us"
        ),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = grid.join(agg, on=keys + ["bucket_us"], how="left")
    return filled.select(
        *keys,
        "bucket_us",
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        "total",
        F.last("total", ignorenulls=True).over(w).alias("total_locf"),
        F.col("n").isNull().alias("is_gap"),
    )


def ohlc_bars(
    events: DataFrame,
    bucket: str = "hour",
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """OHLC candlestick bars: (bucket, *key_cols, open, high, low,
    close, n, volume) per `date_trunc(bucket)` window — the financial/
    telemetry downsampling aggregate (TimescaleDB `candlestick_agg`).

    One map-side-combining hash aggregate: open/close are `min_by`/
    `max_by` picks keyed on a zero-padded ``(epoch_us, id)`` STRING —
    lexicographic order == numeric order, so ties on the timestamp
    break deterministically by ``id_col`` and the result is a pure data
    function (cross-engine exact: DuckDB's arg_min/arg_max accept the
    same VARCHAR key; its arg_min does NOT accept composite struct
    keys, which is why the key is a string). high/low/open/close are
    raw value picks (no float arithmetic); volume sums in DECIMAL.
    Requires non-negative epochs (pre-1970 timestamps would break the
    zero-pad ordering).
    """
    ts = F.col(ts_col).cast("timestamp")
    okey = F.concat(
        F.lpad(F.unix_micros(ts).cast("string"), 20, "0"),
        F.lpad(F.col(id_col).cast("string"), 12, "0"),
    )
    return events.groupBy(
        F.date_trunc(bucket, ts).alias("bucket"), *key_cols
    ).agg(
        F.min_by(value_col, okey).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(value_col, okey).alias("close"),
        F.count("*").cast("long").alias("n"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("volume"),
    )


def anomaly_flags(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    threshold: int = 2,
    min_n: int = 2,
) -> DataFrame:
    """Per-key z-score outliers, integer-exact: rows whose value sits
    more than ``threshold`` sample standard deviations from their key's
    mean. Returns (id, key, v_cents, n) — one row per flagged event.

    The float-free formulation (the repo's standing cross-engine rule:
    never hash-compare a float sum): with v in integer cents and
    per-key integer moments n, s = Σv, s2 = Σv², the predicate

        |v - s/n| > t * sqrt((s2 - s²/n) / (n-1))

    cross-multiplies to

        (n·v - s)² · (n-1)  >  t² · n · (n·s2 - s²)

    — all BIGINT, no division, no sqrt. Shape: one map-side-combining
    moment aggregate (3 partials per key), one equi-join of the tiny
    stats table back to the events (AQE broadcasts it), one scan-side
    Filter. ``min_n`` guards the degenerate n=1 group (variance
    undefined). Strict inequality; t is an integer number of sigmas.
    """
    if threshold < 1 or min_n < 2:
        raise ValueError("threshold >= 1 and min_n >= 2 required")
    v = F.round(F.col(value_col) * 100).cast("long")
    df = events.select(
        F.col(id_col).alias("id"),
        F.col(key_col).alias("key"),
        v.alias("v_cents"),
    )
    stats = df.groupBy("key").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v_cents").alias("s"),
        F.sum(F.col("v_cents") * F.col("v_cents")).alias("s2"),
    )
    t2 = int(threshold) * int(threshold)
    dev = F.col("n") * F.col("v_cents") - F.col("s")
    var_n2 = F.col("n") * F.col("s2") - F.col("s") * F.col("s")
    return (
        df.join(stats, on="key")
        .filter(
            (F.col("n") >= int(min_n))
            & (dev * dev * (F.col("n") - 1) > F.lit(t2) * F.col("n") * var_n2)
        )
        .select("id", "key", "v_cents", "n")
    )


def cusum_stats(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    id_col: str = "event_id",
    drift_cents: int = 10_000,
    threshold_cents: int = 30_000,
) -> DataFrame:
    """Per-key one-sided CUSUM change detection (Page 1954) over the
    event stream, integer-exact. Returns one row per key:
    (key, n, n_alarms, max_stat, first_alarm_rn).

    The textbook recurrence S_i = max(0, S_{i-1} + v_i - k) is
    sequential, which naively forces a per-row loop. It has a closed
    form over prefix sums: with a_i = v_i - k and P_i = Σ_{j<=i} a_j,

        S_i = P_i - min(0, min_{j<=i} P_j)

    so the whole detector is two stacked window functions (running sum,
    then running min of that sum) sharing ONE sort/Exchange on the key —
    no recursion, no Python, scale = a single shuffle regardless of
    per-key history length. v is cent-scaled (round(value*100), the
    repo's standing integer rule), k/h are integer cents, everything
    downstream is BIGINT — hash-exact cross-engine.

    Alarm = S_i > h. Output per key: event count, alarm count, the peak
    statistic, and the 1-based row rank (ordered by ts, id) of the first
    alarm (NULL if none) — rank rather than id so the column is BIGINT
    and oracle-trivial.
    """
    v = F.round(F.col(value_col) * 100).cast("long")
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    d = events.select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("id"),
        ts_us.alias("ts_us"),
        (v - F.lit(int(drift_cents))).alias("a"),
    )
    w = Window.partitionBy("key").orderBy("ts_us", "id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = d.select(
        "key",
        F.row_number().over(w).alias("rn"),
        F.sum("a").over(run).alias("p"),
    )
    run2 = (
        Window.partitionBy("key")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("m", F.min("p").over(run2))
    s = F.col("p") - F.least(F.lit(0).cast("long"), F.col("m"))
    alarm = s > F.lit(int(threshold_cents))
    return d.groupBy("key").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(alarm.cast("long")).cast("long").alias("n_alarms"),
        F.max(s).cast("long").alias("max_stat"),
        F.min(F.when(alarm, F.col("rn"))).cast("long").alias("first_alarm_rn"),
    )


def interval_concurrency(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    dur_scale: int = 1,
) -> DataFrame:
    """Max concurrent overlapping intervals per key — the sweep-line
    counting aggregate (room occupancy / connection concurrency /
    session overlap). Each event is the half-open interval
    [ts, ts + max(1ms, floor(value*1000)) ms · dur_scale)
    (``dur_scale`` stretches the value-derived duration so sparse
    test data still overlaps; production callers pass real end
    timestamps via a computed ``value_col``).

    Explode every interval into (+1 at start, -1 at end) deltas, one
    running sum ordered by (t, delta) per key — the -1 < +1 tie order
    IS the half-open semantic (an interval ending at t frees its slot
    before one starting at t takes it). Max concurrency is invariant to
    row order within equal (t, delta) ties (equal increments commute),
    so the result is a pure data function despite the window.

    Shape: one generate (2 rows/event), ONE Exchange + sort on the key,
    one window sum, one hash aggregate. At 100 TB the key is the
    partition unit; no joins, no Python. Returns
    (*key_cols, n_intervals, max_concurrent).
    """
    start_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    dur_us = (
        F.greatest(F.lit(1), F.floor(F.col(value_col) * 1000)).cast("long")
        * 1000
        * int(dur_scale)
    )
    d = events.select(
        *key_cols,
        F.explode(
            F.array(
                F.struct(
                    start_us.alias("t"), F.lit(1).cast("long").alias("d")
                ),
                F.struct(
                    (start_us + dur_us).alias("t"),
                    F.lit(-1).cast("long").alias("d"),
                ),
            )
        ).alias("ev"),
    ).select(*key_cols, F.col("ev.t").alias("t"), F.col("ev.d").alias("d"))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("c", F.sum("d").over(w))
    return d.groupBy(*key_cols).agg(
        (F.count("*") / 2).cast("long").alias("n_intervals"),
        F.max("c").cast("long").alias("max_concurrent"),
    )


def merge_intervals(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    dur_scale: int = 1,
) -> DataFrame:
    """Coalesce overlapping/touching CLOSED intervals per key — the
    gaps-and-islands merge (calendar busy-blocks, coverage spans, CDN
    outage windows). Each event is [ts, ts + max(1ms, floor(value*1000))
    ms · dur_scale]; production callers pass real end timestamps via a
    computed ``value_col`` (the interval_concurrency convention).

    Two stacked window functions sharing ONE sort on (key, start, end):
    a row opens a new island iff its start exceeds the running max end
    of all earlier rows (closed semantics: touching intervals merge);
    the running sum of those open-flags is the island id; one hash
    aggregate emits (min start, max end, n) per island. Result is a
    pure data function despite ties — two rows with equal (start, end)
    land in the same island in either order, so the merged spans are
    order-independent.

    Shape: ONE Exchange + sort per key, two windows on that sort, one
    aggregate — no self-join (the naive overlap-join is quadratic), no
    Python, no iteration (the running-max closed form replaces the
    "merge until fixpoint" loop). Returns
    (*key_cols, start_us, end_us, n_intervals) with BIGINT bounds.
    """
    start_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    dur_us = (
        F.greatest(F.lit(1), F.floor(F.col(value_col) * 1000)).cast("long")
        * 1000
        * int(dur_scale)
    )
    d = events.select(
        *key_cols, start_us.alias("s"), (start_us + dur_us).alias("e")
    )
    order = Window.partitionBy(*key_cols).orderBy("s", "e")
    prev_max = (
        F.max("e")
        .over(order.rowsBetween(Window.unboundedPreceding, -1))
        .alias("pm")
    )
    d = d.withColumn("pm", prev_max).withColumn(
        "opens",
        F.when(
            F.col("pm").isNull() | (F.col("s") > F.col("pm")), F.lit(1)
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )
    d = d.withColumn(
        "island",
        F.sum("opens").over(
            order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return d.groupBy(*key_cols, "island").agg(
        F.min("s").alias("start_us"),
        F.max("e").alias("end_us"),
        F.count("*").cast("long").alias("n_intervals"),
    ).drop("island")


def forecast_error_sums(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    season: int = 24,
) -> DataFrame:
    """Forecast-baseline evaluation sums — the MASE (Hyndman &
    Koehler 2006) decomposition as exact integers: per key, the
    one-step naive forecast (previous value) and the seasonal-naive
    forecast (value ``season`` steps back) are scored by absolute
    error in cents, and ONE row per key carries
    (n, n_naive, sum_abs_naive, n_seasonal, sum_abs_seasonal).
    The scale-free ratios — MAE_seasonal / MAE_naive and friends —
    are read-time float expressions over these exact sums.

    Shape: two lag windows sharing ONE sort on (key, ts, id) (a single
    Exchange), then a map-side-combining aggregate; cents end to end
    (the standing float rule), no Python, no joins.
    """
    w = Window.partitionBy(*key_cols).orderBy("ts_us", id_col)
    cents = F.round(F.col(value_col) * 100).cast("long")
    d = events.select(
        *key_cols,
        F.col(id_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        cents.alias("v"),
    )
    d = d.withColumn("naive", F.lag("v", 1).over(w)).withColumn(
        "seasonal", F.lag("v", int(season)).over(w)
    )
    abs_n = F.abs(F.col("v") - F.col("naive"))
    abs_s = F.abs(F.col("v") - F.col("seasonal"))
    return d.groupBy(*key_cols).agg(
        F.count("*").cast("long").alias("n"),
        F.count("naive").cast("long").alias("n_naive"),
        F.sum(abs_n).cast("long").alias("sum_abs_naive"),
        F.count("seasonal").cast("long").alias("n_seasonal"),
        F.sum(abs_s).cast("long").alias("sum_abs_seasonal"),
    )


def mad_stats(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Per-key robust location/scale: exact discrete median and median
    absolute deviation in cents — the outlier-resistant counterpart of
    anomaly_flags' mean/variance z-score (MAD-based detection survives
    the contaminated tails that inflate a variance estimate).

    Both medians are discrete-percentile PICKS (the winsorize index
    rule: the max(ceil(n/2), 1)-th smallest value via integer index
    arithmetic), so every output is a raw data value — hash-exact
    cross-engine, no interpolation. Returns
    (*key_cols, n, median_cents, mad_cents).

    Shape: two window-rank passes (one per median), each ONE Exchange
    on the key, with a tiny per-key median table joined back between
    them (AQE broadcasts it). NULL values are excluded.
    """
    keys = list(key_cols)
    cents = F.round(F.col(value_col) * 100).cast("long")
    d = events.where(F.col(value_col).isNotNull()).select(
        *keys, cents.alias("__v")
    )

    def _median(df: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy(*keys).orderBy(col)
        wn = Window.partitionBy(*keys)
        ranked = df.withColumn("__rn", F.row_number().over(w)).withColumn(
            "__n", F.count("*").over(wn)
        )
        idx = F.greatest(
            ((F.col("__n") * 50 + 99) / F.lit(100)).cast("long"), F.lit(1)
        )
        return ranked.where(F.col("__rn") == idx).select(
            *keys,
            F.col(col).alias(out),
            F.col("__n").alias("n"),
        )

    med = _median(d, "__v", "median_cents")
    dev = d.join(
        med.select(*keys, "median_cents"), on=keys
    ).select(
        *keys, F.abs(F.col("__v") - F.col("median_cents")).alias("__d")
    )
    mad = _median(dev, "__d", "mad_cents").select(*keys, "mad_cents")
    return med.join(mad, on=keys).select(
        *keys, "n", "median_cents", "mad_cents"
    )
