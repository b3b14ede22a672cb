"""Geohash encoder: certified against the textbook bisection reference
(including poles and the antimeridian), prefix-blocking property, and
the no-Python plan pin."""

import pytest
from pyspark.sql import functions as F

from kgforge.functions.geo import (
    geohash_col,
    geohash_reference,
    geohash_sql,
)


def _df(spark, pts):
    return spark.createDataFrame(pts, "lat long, lon long")


def test_matches_bisection_reference_randomized(spark):
    import random

    rng = random.Random(41)
    pts = [(57649110, 10407440), (0, 0),
           (90000000, 180000000), (-90000000, -180000000)]
    pts += [
        (rng.randint(-90_000_000, 90_000_000),
         rng.randint(-180_000_000, 180_000_000))
        for _ in range(200)
    ]
    for p in (1, 4, 7, 9):
        rows = _df(spark, pts).select(
            "lat", "lon",
            geohash_col(F.col("lat"), F.col("lon"), p).alias("gh"),
        ).collect()
        for r in rows:
            assert r.gh == geohash_reference(r.lat / 1e6, r.lon / 1e6, p), (
                p, r.lat, r.lon,
            )


def test_duckdb_twin_identical(spark):
    import random

    import duckdb

    rng = random.Random(43)
    pts = [
        (rng.randint(-90_000_000, 90_000_000),
         rng.randint(-180_000_000, 180_000_000))
        for _ in range(100)
    ]
    got = {
        (r.lat, r.lon): r.gh
        for r in _df(spark, pts).select(
            "lat", "lon",
            geohash_col(F.col("lat"), F.col("lon"), 6).alias("gh"),
        ).collect()
    }
    con = duckdb.connect()
    sql = geohash_sql("lat", "lon", 6)
    vals = ", ".join(f"({a}, {b})" for a, b in pts)
    for lat, lon, gh in con.execute(
        f"SELECT lat, lon, {sql} FROM (VALUES {vals}) t(lat, lon)"
    ).fetchall():
        assert got[(lat, lon)] == gh


def test_prefix_blocking_property(spark):
    # nearby points share a coarse prefix; far points do not
    rows = _df(
        spark,
        [(57_649_110, 10_407_440), (57_649_200, 10_407_500),
         (-33_856_800, 151_215_300)],
    ).select(geohash_col(F.col("lat"), F.col("lon"), 7).alias("gh")).collect()
    a, b, c = [r.gh for r in rows]
    assert a[:5] == b[:5]
    assert a[:2] != c[:2]


def test_precision_guard_and_plan(spark):
    with pytest.raises(ValueError, match="1..9"):
        geohash_col(F.col("lat"), F.col("lon"), 10)
    plan = (
        _df(spark, [(0, 0)])
        .select(geohash_col(F.col("lat"), F.col("lon"), 7).alias("gh"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan


def test_neighbor_pairs_matches_bruteforce(spark):
    import random

    from kgforge.functions.geo import neighbor_pairs

    rng = random.Random(47)
    pts = [
        (i, rng.randint(-1_000_000, 1_000_000),
         rng.randint(-1_000_000, 1_000_000))
        for i in range(250)
    ]
    r = 150_000
    df = spark.createDataFrame(pts, "id long, lat long, lon long")
    got = {
        (p.id_a, p.id_b): p.dist2
        for p in neighbor_pairs(df, "id", "lat", "lon", r, 4).collect()
    }
    want = {}
    for i, la, lo in pts:
        for j, lb, lob in pts:
            if i < j and (la - lb) ** 2 + (lo - lob) ** 2 <= r * r:
                want[(i, j)] = (la - lb) ** 2 + (lo - lob) ** 2
    assert got == want and len(want) > 20  # non-vacuous


def test_neighbor_pairs_precision_guard(spark):
    import pytest as _pt

    from kgforge.functions.geo import neighbor_pairs

    df = spark.createDataFrame([(1, 0, 0)], "id long, lat long, lon long")
    with _pt.raises(ValueError, match="smaller than radius"):
        neighbor_pairs(df, "id", "lat", "lon", 10_000_000, 9)
