"""Ordered-funnel conversion analysis over an event stream.

The classic product-analytics operator (ClickHouse `windowFunnel`,
Snowplow/Amplitude funnels): for each user, how far did they get through
an ordered step sequence (e.g. view -> click -> purchase), with the whole
funnel optionally constrained to a time window anchored at the first
matched step. The reference engine has no event analytics at all; this is
an engine-new corpus/event operator in the same family as
`streaming/enrich.py::attribute` and `functions/rollup.py`.

Semantics (deterministic, cross-engine replayable):

- events are walked per user in ``(ts, event_id)`` order;
- step *i+1* must match an event with ts STRICTLY greater than the ts
  matched for step *i* (equal timestamps never advance the funnel — the
  tie-blind rule both a greedy walk and a min-ts SQL cascade agree on);
- the greedy walk takes the EARLIEST match for each step. Greedy is the
  standard funnel definition and equals the SQL cascade
  ``t_{i+1} = min(ts) WHERE type = step_{i+1} AND ts > t_i [AND ts - t_1
  <= within]`` — which is exactly the shape of the driver gate's DuckDB
  oracle (events_funnel);
- ``within`` (microseconds) bounds every later step relative to the FIRST
  step's match (funnel window anchored at entry, the windowFunnel rule).

Scale shape: ONE shuffle (groupBy user) + a `sort_array(collect_list)`
per user + one `aggregate` higher-order-function walk — all JVM-side
expressions, no Python, no per-step join cascade (the oracle's k joins
collapse into one pass). Per-user state is that user's event list, the
same bound as `streaming/sessionize.py`; a pathological hot user is one
fat row, not a hot reducer fan-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    within_us: int | None = None,
) -> DataFrame:
    """Per-user funnel progress: (user, steps_completed, t_first, t_last).

    ``steps`` is the ordered event-type sequence; ``steps_completed`` is
    how many leading steps matched (0..len(steps), BIGINT), ``t_first`` /
    ``t_last`` the epoch-microsecond timestamps of the first and last
    matched step (NULL when steps_completed = 0). ``within_us`` bounds
    ``t_i - t_first`` for every step after the first.
    """
    if not steps:
        raise ValueError("steps must be a non-empty ordered list")
    k = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])

    ev = events.select(
        F.col(user_col).alias("user"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("etype"),
    )
    per_user = ev.groupBy("user").agg(
        F.sort_array(
            F.collect_list(F.struct("ts_us", "eid", "etype"))
        ).alias("evs")
    )

    zero = F.struct(
        F.lit(0).cast("int").alias("reached"),
        F.lit(None).cast("long").alias("t0"),
        F.lit(None).cast("long").alias("tlast"),
    )

    def _step(acc, x):
        matches = (acc["reached"] < F.lit(k)) & (
            x["etype"] == F.element_at(steps_arr, acc["reached"] + 1)
        )
        after_prev = (acc["reached"] == 0) | (x["ts_us"] > acc["tlast"])
        in_window = F.lit(True)
        if within_us is not None:
            in_window = (acc["reached"] == 0) | (
                x["ts_us"] - acc["t0"] <= F.lit(int(within_us))
            )
        advanced = F.struct(
            (acc["reached"] + 1).alias("reached"),
            F.coalesce(acc["t0"], x["ts_us"]).alias("t0"),
            x["ts_us"].alias("tlast"),
        )
        return F.when(matches & after_prev & in_window, advanced).otherwise(
            acc
        )

    walked = per_user.select(
        "user", F.aggregate("evs", zero, _step).alias("w")
    )
    return walked.select(
        F.col("user"),
        F.col("w.reached").cast("long").alias("steps_completed"),
        F.col("w.t0").alias("t_first"),
        F.col("w.tlast").alias("t_last"),
    )


def retention_cohorts(
    events: DataFrame,
    period_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort-retention matrix: (cohort_date, offset, n_users).

    The other standard product-analytics table (ClickHouse `retention`,
    Amplitude/Mixpanel cohort grids): users are grouped into cohorts by
    the DATE of their first event; ``n_users`` counts how many of each
    cohort were active again ``offset`` periods (of ``period_days`` days)
    after that date. offset 0 is the cohort size itself; all values are
    integers, so the matrix is cross-engine exact.

    Scale shape: first-event per user is a map-side-combined min;
    the join back is keyed on the user column, co-partitioned with that
    groupBy's shuffle; activity is reduced to DISTINCT (user, cohort,
    offset) — partial-aggregated — before the final tiny
    (cohort, offset) count. No window functions, no skew key (a hot
    user still collapses to one row per offset at the map side).
    """
    if period_days <= 0:
        raise ValueError("period_days must be positive")
    ev = events.select(
        F.col(user_col).alias("user"),
        F.to_date(F.col(ts_col).cast("timestamp")).alias("d"),
    )
    first = ev.groupBy("user").agg(F.min("d").alias("cohort_date"))
    act = (
        ev.join(first, "user")
        .select(
            "user",
            "cohort_date",
            F.floor(F.datediff("d", "cohort_date") / period_days)
            .cast("long")
            .alias("offset"),
        )
        .distinct()
    )
    return act.groupBy("cohort_date", "offset").agg(
        F.count("*").cast("long").alias("n_users")
    )


def event_ngrams(
    events: DataFrame,
    n: int = 3,
    min_count: int = 1,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Frequent event paths: (gram, cnt) — every length-``n`` run of
    consecutive events per user, rendered ``'a->b->c'``, corpus-counted.

    The path-analysis primitive behind "what do users do before X"
    (ClickHouse sequenceCount family). Ordering is (ts, event_id) —
    the funnel module's deterministic tie rule. Same scale shape as
    `funnel`: ONE shuffle collects each user's sorted event list, then
    n-gram generation is higher-order-function expressions (no
    window-function cascade, no self-join chain — the oracle runs the
    lead()-window form); counting is map-side combined. A hot user is
    one fat row, not a hot reducer fan-in.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    ev = events.select(
        F.col(user_col).alias("user"),
        F.struct(
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
            F.col(id_col).alias("eid"),
            F.col(type_col).alias("etype"),
        ).alias("e"),
    )
    # materialize the type sequence ONCE (HOF subexpressions are not
    # CSE'd — size/slice below must read a projected column, not
    # re-evaluate the transform per reference)
    per_user = ev.groupBy("user").agg(
        F.sort_array(F.collect_list("e")).alias("evs")
    ).select(
        "user",
        F.transform(F.col("evs"), lambda x: x["etype"]).alias("__seq"),
    )
    seq = F.col("__seq")
    idx = F.sequence(F.lit(1), F.size(seq) - (n - 1))
    grams = F.when(
        F.size(seq) >= n,
        F.transform(
            idx, lambda i: F.array_join(F.slice(seq, i, n), "->")
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        per_user.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").cast("long").alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )


def lifecycle_snapshot(
    events: DataFrame,
    stages: list[str],
    key_col: str = "user_id",
    stage_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Accumulating-snapshot fact table: ONE row per key with the FIRST
    occurrence time of each lifecycle stage pivoted to a column
    (``ts_<stage>``, BIGINT epoch microseconds) plus the lag between
    consecutive stages (``us_<a>_to_<b>``, NULL when either side is
    missing). The Kimball milestone-tracking shape: signup->view->
    purchase latency reports read one tiny row per entity instead of
    re-scanning the event log.

    One map-side-combining hash aggregate (k conditional MINs in a
    single pass — never k self-joins); all outputs are integer
    microsecond picks/diffs, hash-exact cross-engine. ``stages`` is the
    explicit ordered milestone list; durations may be negative if a
    later-listed stage actually happened first (the report's signal
    that the funnel was skipped or reordered)."""
    if not stages or len(set(stages)) != len(stages):
        raise ValueError("stages must be a non-empty list of unique names")
    m = F.unix_micros(F.col(ts_col).cast("timestamp"))
    aggs = [
        F.min(F.when(F.col(stage_col) == s, m)).alias(f"ts_{s}")
        for s in stages
    ]
    out = events.groupBy(F.col(key_col).alias("key")).agg(*aggs)
    for a, b in zip(stages, stages[1:]):
        out = out.withColumn(
            f"us_{a}_to_{b}", F.col(f"ts_{b}") - F.col(f"ts_{a}")
        )
    return out


def state_runs(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Run-length encoding of per-key state sequences: consecutive
    events with the SAME state collapse into one run —
    (key, state, run_index, n_events, start_us, end_us). The
    state-sequence miner's first normalization (dwell-time analysis,
    loop detection, Markov-chain construction on runs instead of raw
    events).

    The change flag ``state != lag(state)`` + a running sum is the
    value-change twin of merge_intervals' gaps-and-islands: two window
    functions sharing ONE (key, ts, id) sort — a single Exchange —
    then one hash aggregate. NULL states form runs of their own (an
    unknown-state stretch is still a stretch; lag comparison is
    null-safe).
    """
    d = events.select(
        F.col(key_col).alias("key"),
        F.col(state_col).alias("state"),
        F.col(id_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
    )
    order = Window.partitionBy("key").orderBy("ts_us", id_col)
    prev = F.lag("state").over(order)
    # a run opens on the FIRST row or on a null-safe state change —
    # isnull(lag) alone would also split consecutive NULL states
    changed = F.when(
        (F.row_number().over(order) == 1)
        | ~prev.eqNullSafe(F.col("state")),
        F.lit(1),
    ).otherwise(F.lit(0))
    d = d.withColumn("__chg", changed)
    run = F.sum("__chg").over(
        Window.partitionBy("key")
        .orderBy("ts_us", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("run_index", run.cast("long"))
    return d.groupBy("key", "run_index").agg(
        # all states in a run are equal by construction; min is the
        # order-free way to say so (all-NULL run -> NULL)
        F.min("state").alias("state"),
        F.count("*").cast("long").alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
    )
