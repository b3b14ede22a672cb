"""Dataset profiling unit tests: the one-pass column profile (including
the DOUBLE columns the driver gate excludes for rendering portability),
all-null handling, and FK inclusion stats."""

from pyspark.sql import functions as F

from kgforge.operators.profile import inclusion_stats, profile_columns


def test_profile_all_types_one_pass(spark):
    d = spark.createDataFrame(
        [(1, "a", None, None), (2, "b", 3.5, None), (2, None, 4.5, None)],
        "k long, s string, v double, z string",
    )
    got = {r.col_name: r for r in profile_columns(d).collect()}
    assert set(got) == {"k", "s", "v", "z"}
    assert (got["k"].n_rows, got["k"].n_nulls, got["k"].n_distinct) == (
        3, 0, 2,
    )
    assert (got["k"].min_str, got["k"].max_str) == ("1", "2")
    assert (got["s"].n_nulls, got["s"].min_str, got["s"].max_str) == (
        1, "a", "b",
    )
    # DOUBLE profiled fine in-engine (gate excludes only for rendering)
    assert (got["v"].n_distinct, got["v"].min_str, got["v"].max_str) == (
        2, "3.5", "4.5",
    )
    # all-null column: extrema NULL, distinct 0
    assert (got["z"].n_nulls, got["z"].n_distinct, got["z"].min_str) == (
        3, 0, None,
    )


def test_profile_single_aggregate_plan(spark):
    d = spark.createDataFrame([(1, "a")], "k long, s string")
    plan = (
        profile_columns(d)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one scan, no Python, no join
    assert "Join" not in plan and "Python" not in plan


def test_inclusion_stats_partial_and_full(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (None,)], "x long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "y long")
    row = inclusion_stats(child, "x", parent, "y").collect()[0]
    assert (row.n_child_distinct, row.n_parent_distinct, row.n_contained) \
        == (3, 3, 2)
    full = inclusion_stats(parent, "y", parent, "y").collect()[0]
    assert full.n_contained == full.n_child_distinct == 3
