"""Funnel-walk semantics the driver gate can't isolate: strict-ts
advance, window anchoring at the first step, greedy-earliest matching,
tie behavior at equal timestamps."""

import datetime as dt

from pyspark.sql import functions as F

from kgforge.functions.funnel import funnel

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    # rows: (user, minutes_after_t0, event_id, type)
    data = [
        (u, T0 + dt.timedelta(minutes=m), eid, t) for u, m, eid, t in rows
    ]
    return spark.createDataFrame(
        data, "user_id long, ts timestamp, event_id long, event_type string"
    )


def _run(spark, rows, steps=("a", "b", "c"), within_us=None):
    out = funnel(_ev(spark, rows), list(steps), within_us=within_us)
    return {
        r.user: (r.steps_completed, r.t_first, r.t_last)
        for r in out.collect()
    }


def test_full_and_partial_completion(spark):
    got = _run(
        spark,
        [
            (1, 0, 10, "a"), (1, 5, 11, "b"), (1, 9, 12, "c"),
            (2, 0, 20, "a"), (2, 5, 21, "c"),  # skips b: stuck at 1
            (3, 0, 30, "x"),  # never enters
        ],
    )
    assert got[1][0] == 3
    assert got[1][2] - got[1][1] == 9 * 60_000_000
    assert got[2][0] == 1
    assert got[2][1] == got[2][2]
    assert got[3] == (0, None, None)


def test_order_matters_not_presence(spark):
    # b before a: the walk must not count the early b
    got = _run(spark, [(1, 0, 10, "b"), (1, 5, 11, "a")])
    assert got[1][0] == 1


def test_greedy_takes_earliest_match(spark):
    # two a's: t_first anchors at the FIRST a even though the second
    # would also work
    got = _run(
        spark,
        [(1, 0, 10, "a"), (1, 3, 11, "a"), (1, 7, 12, "b")],
    )
    assert got[1][0] == 2
    # anchored at the first a (+0), not the second (+3)
    assert got[1][2] - got[1][1] == 7 * 60_000_000


def test_equal_ts_never_advances(spark):
    # b at exactly the same ts as the matched a: strict > blocks it
    got = _run(spark, [(1, 0, 10, "a"), (1, 0, 11, "b")])
    assert got[1][0] == 1
    # but a LATER b still advances
    got = _run(
        spark, [(1, 0, 10, "a"), (1, 0, 11, "b"), (1, 2, 12, "b")]
    )
    assert got[1][0] == 2
    assert got[1][2] - got[1][1] == 2 * 60_000_000


def test_window_anchored_at_first_step(spark):
    rows = [(1, 0, 10, "a"), (1, 30, 11, "b"), (1, 90, 12, "c")]
    # 90 min window: c at +90 is inside (<=)
    got = _run(spark, rows, within_us=90 * 60_000_000)
    assert got[1][0] == 3
    # 60 min window: b ok, c out
    got = _run(spark, rows, within_us=60 * 60_000_000)
    assert got[1][0] == 2
    # greedy deviation pin: a second 'a' at +60 could complete the
    # funnel within 60 min, but the walk anchors at the FIRST a
    rows2 = rows + [(1, 60, 13, "a")]
    got = _run(spark, rows2, within_us=60 * 60_000_000)
    assert got[1][0] == 2


def test_funnel_rejects_empty_steps(spark):
    import pytest

    with pytest.raises(ValueError):
        funnel(_ev(spark, []), [])


def test_funnel_plan_has_single_shuffle_no_python(spark):
    df = funnel(
        _ev(spark, [(1, 0, 10, "a")]), ["a", "b"], within_us=1
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
    assert plan.count("Exchange") <= 2  # one agg shuffle (+AQE read)
    assert "Python" not in plan  # pure JVM higher-order functions
    assert "Join" not in plan  # the oracle's cascade collapsed


def test_retention_cohorts_hand_grid(spark):
    """Hand-derived cohort grid: two cohorts, known week offsets,
    multiple events per (user, week) collapse to one."""
    import datetime as dt

    import pytest
    from pyspark.sql import functions as F  # noqa: F401

    from kgforge.functions.funnel import retention_cohorts

    d = dt.datetime
    rows = [
        # cohort 2024-01-01: users 1, 2
        (1, d(2024, 1, 1, 9)), (1, d(2024, 1, 3, 9)),   # wk0 twice
        (1, d(2024, 1, 8, 9)),                          # wk1
        (2, d(2024, 1, 1, 23)), (2, d(2024, 1, 22, 5)),  # wk0, wk3
        # cohort 2024-01-02: user 3, only week 0
        (3, d(2024, 1, 2, 0)), (3, d(2024, 1, 7, 12)),
        # day 6 after cohort start is still offset 0; day 7 is offset 1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (str(r.cohort_date), r.offset): r.n_users
        for r in retention_cohorts(df, period_days=7).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-01-02", 0): 1,
    }
    with pytest.raises(ValueError):
        retention_cohorts(df, period_days=0)


def test_event_ngrams_hand_paths(spark):
    """Hand sequences: per-user consecutive runs only, (ts, event_id)
    tie order, short users contribute nothing, min_count prunes."""
    import datetime as dt

    import pytest

    from kgforge.functions.funnel import event_ngrams

    d = dt.datetime
    rows = [
        # user 1: a b c d  -> a->b->c, b->c->d
        (1, 1, d(2024, 1, 1, 0), "a"), (2, 1, d(2024, 1, 1, 1), "b"),
        (3, 1, d(2024, 1, 1, 2), "c"), (4, 1, d(2024, 1, 1, 3), "d"),
        # user 2: tie on ts broken by event_id: x(5) y(6) z(7)
        (6, 2, d(2024, 1, 2, 0), "y"), (5, 2, d(2024, 1, 2, 0), "x"),
        (7, 2, d(2024, 1, 2, 0), "z"),
        # user 3: too short
        (8, 3, d(2024, 1, 3, 0), "a"), (9, 3, d(2024, 1, 3, 1), "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {r.gram: r.cnt for r in event_ngrams(df, n=3).collect()}
    assert got == {"a->b->c": 1, "b->c->d": 1, "x->y->z": 1}
    # n=2 over user 3 contributes a->b; min_count=2 keeps only repeats
    got2 = {r.gram: r.cnt for r in event_ngrams(df, n=2).collect()}
    assert got2["a->b"] == 2  # users 1 and 3
    pruned = {r.gram for r in event_ngrams(df, n=2, min_count=2).collect()}
    assert pruned == {"a->b"}
    with pytest.raises(ValueError):
        event_ngrams(df, n=0)


def test_lifecycle_snapshot_hand_case(spark):
    from datetime import datetime

    import pytest

    from kgforge.functions.funnel import lifecycle_snapshot

    rows = [
        # user 1: full ordered funnel; duplicate signup keeps the FIRST
        (1, "signup", datetime(2024, 1, 1, 0, 0, 0)),
        (1, "signup", datetime(2024, 1, 2, 0, 0, 0)),
        (1, "view", datetime(2024, 1, 1, 0, 0, 10)),
        (1, "purchase", datetime(2024, 1, 1, 0, 1, 0)),
        # user 2: skipped 'view' -> NULL column and NULL durations
        (2, "signup", datetime(2024, 1, 1, 0, 0, 0)),
        (2, "purchase", datetime(2024, 1, 1, 2, 0, 0)),
        # user 3: reordered funnel -> negative duration is the signal
        (3, "view", datetime(2024, 1, 1, 1, 0, 0)),
        (3, "signup", datetime(2024, 1, 1, 2, 0, 0)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {
        r.key: r
        for r in lifecycle_snapshot(
            ev, ["signup", "view", "purchase"]
        ).collect()
    }
    r1 = out[1]
    assert r1.us_signup_to_view == 10_000_000
    assert r1.us_view_to_purchase == 50_000_000
    r2 = out[2]
    assert r2.ts_view is None
    assert r2.us_signup_to_view is None and r2.us_view_to_purchase is None
    r3 = out[3]
    assert r3.us_signup_to_view == -3_600_000_000

    with pytest.raises(ValueError):
        lifecycle_snapshot(ev, [])
    with pytest.raises(ValueError):
        lifecycle_snapshot(ev, ["a", "a"])


def test_state_runs_rle_and_null_states(spark):
    import datetime as dt

    from kgforge.functions.funnel import state_runs

    T0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, T0 + dt.timedelta(minutes=m), 100 + m, s)
        for m, s in enumerate(["a", "a", "b", None, None, "b", "b"])
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    runs = sorted(
        (r.run_index, r.state, r.n_events)
        for r in state_runs(ev).collect()
    )
    assert runs == [
        (1, "a", 2), (2, "b", 1), (3, None, 2), (4, "b", 2),
    ]


def test_state_runs_one_exchange(spark):
    import datetime as dt

    from kgforge.functions.funnel import state_runs

    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1, "a")],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    plan = state_runs(ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan
