"""2-D skyline operator (operators/skyline.py).

The driver gate (events_skyline-style NOT EXISTS oracle on parts) pins
values; these tests pin semantics the gate can't isolate: duplicates,
direction flips, NULL drops, partition-count invariance vs brute force.
"""

import hashlib

import pytest

from kgforge.operators.skyline import skyline_2d


def _brute(rows, x_dir="min", y_dir="min"):
    def better(q, p):
        qx, qy, px, py = q[0], q[1], p[0], p[1]
        if x_dir == "max":
            qx, px = -qx, -px
        if y_dir == "max":
            qy, py = -qy, -py
        return qx <= px and qy <= py and (qx < px or qy < py)

    return sorted(
        p for p in rows if not any(better(q, p) for q in rows if q != p)
        or any(q == p and q is not p for q in rows)  # dup copies survive
    )


def test_skyline_hand_case_and_duplicates(spark):
    rows = [(1, 9), (2, 7), (3, 8), (4, 4), (4, 4), (5, 5), (9, 1), (9, 2)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
    # front: (1,9),(2,7),(4,4)x2,(9,1); (3,8) dom by (2,7); (5,5) by
    # (4,4); (9,2) by (9,1)
    assert got == [(1, 9), (2, 7), (4, 4), (4, 4), (9, 1)]


def test_skyline_direction_flips_and_nulls(spark):
    rows = [(1, 1), (2, 5), (3, 3), (None, 9), (4, None)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = sorted(
        (r.x, r.y)
        for r in skyline_2d(df, "x", "y", x_dir="min", y_dir="max").collect()
    )
    # maximize y: (1,1) survives (best x), (2,5) (best y); (3,3) dom by
    # (2,5); NULL rows dropped
    assert got == [(1, 1), (2, 5)]


def test_skyline_matches_bruteforce_any_partitioning(spark):
    rows = []
    for i in range(300):
        h = hashlib.md5(f"sky|{i}".encode()).hexdigest()
        rows.append((int(h[:4], 16) % 100, int(h[4:8], 16) % 100))
    df = spark.createDataFrame(rows, "x long, y long")
    want = sorted(
        p for p in rows
        if not any(
            q[0] <= p[0] and q[1] <= p[1] and (q[0] < p[0] or q[1] < p[1])
            for q in rows
        )
    )
    for n in (1, 3, 16):
        got = sorted(
            (r.x, r.y)
            for r in skyline_2d(df, "x", "y", num_partitions=n).collect()
        )
        assert got == want, f"partitions={n}"


def test_skyline_guards(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError):
        skyline_2d(df, "x", "y", x_dir="up")
    bad = df.withColumnRenamed("y", "__y")
    with pytest.raises(ValueError):
        skyline_2d(bad.withColumn("y", bad["__y"]), "x", "y")


def test_skyline_float_keys_regression(spark):
    # prices 0.1 apart: a rangeBetween(-1) VALUE frame would silently
    # miss dominators within 1.0 of each other — pin the float case
    rows = [(900.0, 24), (900.1, 10), (900.2, 30), (900.3, 29)]
    df = spark.createDataFrame(rows, "price double, size long")
    got = sorted(
        (r.price, r.size)
        for r in skyline_2d(df, "price", "size",
                            x_dir="min", y_dir="max").collect()
    )
    # (900.1,10) dom by (900.0,24); (900.3,29) dom by (900.2,30)
    assert got == [(900.0, 24), (900.2, 30)]
