"""CUSUM / interval-concurrency / exact-OLS unit tests: each operator is
replayed by an independent pure-Python reference on randomized data, and
the plan shapes are pinned (no Python on the data plane, windows share
one Exchange)."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from kgforge.functions.regress import linfit_eval, linfit_sums
from kgforge.functions.rollup import cusum_stats, interval_concurrency

EPOCH = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    """rows: (event_id, key, ts_offset_s, value)."""
    return spark.createDataFrame(
        [
            (eid, EPOCH + dt.timedelta(seconds=off), key, float(v))
            for (eid, key, off, v) in rows
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )


def _cusum_ref(values_cents, k, h):
    """The textbook sequential recurrence the closed form must match."""
    s, mx, alarms, first = 0, 0, 0, None
    for i, v in enumerate(values_cents, start=1):
        s = max(0, s + v - k)
        mx = max(mx, s)
        if s > h:
            alarms += 1
            if first is None:
                first = i
    return alarms, mx, first


def test_cusum_matches_sequential_recurrence(spark):
    rng = random.Random(7)
    rows, expect = [], {}
    eid = 0
    for key in range(6):
        vals = [rng.randint(0, 120) / 1.0 for _ in range(rng.randint(1, 60))]
        # inject an upward shift for half the keys so alarms are real
        if key % 2 == 0:
            vals += [250 + rng.randint(0, 60) for _ in range(10)]
        cents = [round(v * 100) for v in vals]
        expect[key] = (len(vals),) + _cusum_ref(cents, 10_000, 30_000)
        for i, v in enumerate(vals):
            rows.append((eid, key, i * 60, v))
            eid += 1
    out = {
        r["key"]: (r["n"], r["n_alarms"], r["max_stat"], r["first_alarm_rn"])
        for r in cusum_stats(
            _events(spark, rows), drift_cents=10_000, threshold_cents=30_000
        ).collect()
    }
    for key, (n, alarms, mx, first) in expect.items():
        assert out[key] == (n, alarms, mx, first), key
    # non-vacuous: some keys alarm, some don't
    alarmed = [k for k, v in expect.items() if v[1] > 0]
    assert alarmed and len(alarmed) < len(expect)


def test_cusum_tie_order_is_ts_then_id(spark):
    # two events share a timestamp: ordering must break by event_id
    rows = [(2, 1, 0, 400.0), (1, 1, 0, 10.0), (3, 1, 60, 400.0)]
    out = cusum_stats(
        _events(spark, rows), drift_cents=10_000, threshold_cents=20_000
    ).collect()[0]
    # order by id: 1000, 40000, 40000 cents; a = -9000, +30000, +30000
    assert out["max_stat"] == 60_000
    assert out["n_alarms"] == 2
    assert out["first_alarm_rn"] == 2


def test_cusum_plan_one_exchange_no_python(spark):
    ev = _events(spark, [(i, i % 3, i * 10, float(i)) for i in range(30)])
    plan = (
        cusum_stats(ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEvalPython" not in plan
    # both windows + the final agg hash-partition on the key: the sort
    # column set changes (rn vs ts), but there is exactly ONE
    # hashpartitioning subject (key), so shuffles stay bounded
    assert plan.count("Exchange hashpartitioning") <= 2


def _conc_ref(intervals):
    """Brute-force sweep: max concurrency over half-open intervals."""
    best = 0
    for s, _ in intervals:
        c = sum(1 for a, b in intervals if a <= s < b)
        best = max(best, c)
    return best


def test_concurrency_matches_bruteforce(spark):
    rng = random.Random(11)
    rows = []
    intervals = {"a": [], "b": []}
    eid = 0
    for key in ["a", "b"]:
        for _ in range(40):
            off = rng.randint(0, 3600)
            dur_ms = max(1, int(rng.randint(1, 900) * 1000 / 1000) * 1000)
            v = dur_ms / 1000.0  # value seconds -> floor(value*1000) ms
            s_us = off * 1_000_000
            intervals[key].append((s_us, s_us + dur_ms * 1000))
            rows.append((eid, EPOCH + dt.timedelta(seconds=off), key, v))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = {
        r["event_type"]: (r["n_intervals"], r["max_concurrent"])
        for r in interval_concurrency(df).collect()
    }
    for key in intervals:
        assert out[key] == (40, _conc_ref(intervals[key])), key


def test_concurrency_half_open_no_touch_overlap(spark):
    # interval A ends exactly where B starts: never concurrent
    rows = [
        (1, EPOCH, "k", 10.0),  # [0, 10s)
        (2, EPOCH + dt.timedelta(seconds=10), "k", 10.0),  # [10s, 20s)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = interval_concurrency(df).collect()[0]
    assert out["max_concurrent"] == 1


def test_linfit_exact_on_known_line(spark):
    # y = 3x + 7 exactly: slope_num/slope_den == 3, r2 == 1
    rows = [(i, "g", float(i), float(3 * i + 7)) for i in range(1, 20)]
    df = spark.createDataFrame(rows, "i long, g string, x double, y double")
    sums = linfit_sums(
        df, ["g"], F.col("x").cast("long"), F.col("y").cast("long")
    )
    r = linfit_eval(sums).collect()[0]
    assert int(r["slope_num"]) % int(r["slope_den"]) == 0
    assert int(r["slope_num"]) // int(r["slope_den"]) == 3
    assert r["slope"] == pytest.approx(3.0)
    assert r["intercept"] == pytest.approx(7.0)
    assert r["r2"] == pytest.approx(1.0)


def test_linfit_matches_numpy_polyfit(spark):
    import numpy as np

    rng = random.Random(3)
    xs = [rng.randint(1, 50) for _ in range(200)]
    ys = [5 * x + rng.randint(-40, 40) for x in xs]
    df = spark.createDataFrame(
        [(i, "g", float(x), float(y)) for i, (x, y) in enumerate(zip(xs, ys))],
        "i long, g string, x double, y double",
    )
    r = linfit_eval(
        linfit_sums(df, ["g"], F.col("x").cast("long"), F.col("y").cast("long"))
    ).collect()[0]
    slope, intercept = np.polyfit(np.array(xs), np.array(ys), 1)
    assert r["slope"] == pytest.approx(float(slope), rel=1e-9)
    assert r["intercept"] == pytest.approx(float(intercept), rel=1e-9)
    corr = np.corrcoef(xs, ys)[0, 1]
    assert r["r2"] == pytest.approx(float(corr) ** 2, rel=1e-9)


def test_linfit_degenerate_constant_x_yields_null_slope(spark):
    df = spark.createDataFrame(
        [(1, "g", 4.0, 1.0), (2, "g", 4.0, 9.0)],
        "i long, g string, x double, y double",
    )
    r = linfit_eval(
        linfit_sums(df, ["g"], F.col("x").cast("long"), F.col("y").cast("long"))
    ).collect()[0]
    assert int(r["slope_den"]) == 0 and r["slope"] is None and r["r2"] is None


def test_linfit_plan_single_agg_no_python(spark):
    df = spark.createDataFrame(
        [(i, "g", float(i), float(i)) for i in range(10)],
        "i long, g string, x double, y double",
    )
    plan = (
        linfit_sums(df, ["g"], F.col("x").cast("long"), F.col("y").cast("long"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # one partial+final agg


# ---------------------------------------------------------------------
# merge_intervals (gaps-and-islands coalescing)
# ---------------------------------------------------------------------


def _merge_ref(intervals):
    """Pure-Python closed-interval coalescing reference."""
    out = []
    for s, e in sorted(intervals):
        if out and s <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], e), out[-1][2] + 1)
        else:
            out.append((s, e, 1))
    return sorted(out)


def test_merge_intervals_matches_bruteforce(spark):
    from kgforge.functions.rollup import merge_intervals

    rng = random.Random(17)
    rows, ref = [], {1: [], 2: []}
    eid = 0
    for key in (1, 2):
        for _ in range(60):
            off = rng.randint(0, 2000)
            dur_s = rng.randint(1, 120)
            s_us = off * 1_000_000
            e_us = s_us + dur_s * 1_000_000
            ref[key].append((s_us, e_us))
            rows.append((eid, key, off, float(dur_s)))
            eid += 1
    out = merge_intervals(_events(spark, rows)).collect()
    # session tz = local; ts literals were built from naive EPOCH
    t0 = int(EPOCH.timestamp() * 1e6)
    for key in ref:
        got = sorted(
            (r.start_us - t0, r.end_us - t0, r.n_intervals)
            for r in out
            if r.user_id == key
        )
        assert got == [(s, e, n) for s, e, n in _merge_ref(ref[key])], key


def test_merge_intervals_touching_closed_semantics(spark):
    from kgforge.functions.rollup import merge_intervals

    # [0,5] and [5,8] touch -> ONE island (closed intervals)
    rows = [(1, 1, 0, 5.0), (2, 1, 5, 3.0)]
    out = merge_intervals(_events(spark, rows)).collect()
    assert len(out) == 1 and out[0].n_intervals == 2


def test_merge_intervals_plan_one_exchange_no_python(spark):
    from kgforge.functions.rollup import merge_intervals

    plan = (
        merge_intervals(_events(spark, [(1, 1, 0, 5.0)]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------
# chi-square contingency sums
# ---------------------------------------------------------------------


def test_chisq_exact_and_full_grid(spark):
    from kgforge.functions.regress import chisq_eval, chisq_sums

    d = spark.createDataFrame(
        [("a", "x")] * 10 + [("a", "y")] * 20 + [("b", "x")] * 30,
        "r string, c string",
    )
    cells = {
        (r.row_key, r.col_key): (r.o, int(r.det))
        for r in chisq_sums(d, "r", "c").collect()
    }
    # absent cell (b, y) IS emitted with o=0
    assert cells == {
        ("a", "x"): (10, -600),
        ("a", "y"): (20, 600),
        ("b", "x"): (30, 600),
        ("b", "y"): (0, -600),
    }
    ev = chisq_eval(chisq_sums(d, "r", "c")).collect()[0]
    assert ev.n == 60 and ev.dof == 1
    assert ev.chi2 == pytest.approx(30.0)


def test_chisq_independent_is_zero(spark):
    from kgforge.functions.regress import chisq_sums

    # perfectly independent 2x2 (balanced): every determinant is 0
    d = spark.createDataFrame(
        [("a", "x")] * 5 + [("a", "y")] * 5 + [("b", "x")] * 5 + [("b", "y")] * 5,
        "r string, c string",
    )
    assert {int(r.det) for r in chisq_sums(d, "r", "c").collect()} == {0}


# ---------------------------------------------------------------------
# forecast-baseline error sums (MASE decomposition)
# ---------------------------------------------------------------------


def test_forecast_error_sums_hand_computed(spark):
    from kgforge.functions.rollup import forecast_error_sums

    # one key, values 1,3,2,5 (dollars) at seconds 0..3; season=2
    rows = [(i, 1, i, float(v)) for i, v in enumerate([1, 3, 2, 5])]
    out = forecast_error_sums(
        _events(spark, rows), ("user_id",), season=2
    ).collect()[0]
    # cents: 100,300,200,500; naive errs |300-100|,|200-300|,|500-200|
    assert (out.n, out.n_naive, out.sum_abs_naive) == (4, 3, 600)
    # seasonal lag2 errs: |200-100|, |500-300|
    assert (out.n_seasonal, out.sum_abs_seasonal) == (2, 300)


def test_forecast_error_sums_one_exchange(spark):
    from kgforge.functions.rollup import forecast_error_sums

    plan = (
        forecast_error_sums(
            _events(spark, [(1, 1, 0, 1.0)]), ("user_id",)
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan


# ---------------------------------------------------------------------
# exact median + MAD
# ---------------------------------------------------------------------


def test_mad_hand_computed_and_python_replay(spark):
    from kgforge.functions.rollup import mad_stats

    # key 1: cents 100,200,300,1000 -> n=4, median pick idx ceil(2)=2
    # -> 200; devs 100,0,100,800 sorted 0,100,100,800 -> pick idx 2 = 100
    rows = [(i, 1, i, v) for i, v in enumerate([1.0, 2.0, 3.0, 10.0])]
    rows += [(10 + i, 2, i, v) for i, v in enumerate([5.0])]  # singleton
    out = {
        r.user_id: (r.n, r.median_cents, r.mad_cents)
        for r in mad_stats(
            _events(spark, rows), ("user_id",)
        ).collect()
    }
    assert out[1] == (4, 200, 100)
    assert out[2] == (1, 500, 0)

    # randomized python replay of the pick rule
    rng = random.Random(23)
    vals = [rng.randint(-500, 500) / 1.0 for _ in range(101)]
    rows = [(i, 7, i, v) for i, v in enumerate(vals)]
    got = mad_stats(_events(spark, rows), ("user_id",)).collect()[0]
    cents = sorted(round(v * 100) for v in vals)
    med = cents[(len(cents) * 50 + 99) // 100 - 1]
    devs = sorted(abs(c - med) for c in cents)
    mad = devs[(len(devs) * 50 + 99) // 100 - 1]
    assert (got.median_cents, got.mad_cents) == (med, mad)
