"""Snapshot diff: hand-built CDC matrix incl. NULL transitions."""

import pytest


def test_snapshot_diff_kinds_and_null_safety(spark):
    from kgforge.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [
            (1, "a", 10),     # unchanged
            (2, "b", 20),     # value change
            (3, None, 30),    # NULL -> value
            (4, "d", None),   # value stays NULL (unchanged)
            (5, "e", 50),     # removed
            (7, "g", 70),     # both cols change
        ],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "B", 20),
            (3, "c", 30),
            (4, "d", None),
            (6, "f", 60),     # added
            (7, "G", 71),
        ],
        "k long, s string, v long",
    )
    got = {
        r.k: (r.change, r.changed_cols)
        for r in snapshot_diff(old, new, "k").collect()
    }
    assert got == {
        2: ("changed", "s"),
        3: ("changed", "s"),
        5: ("removed", ""),
        6: ("added", ""),
        7: ("changed", "s,v"),
    }
    # explicit compare_cols subset: v-only change at key 7 invisible for ["s"]? no — s changed too
    sub = {
        r.k: (r.change, r.changed_cols)
        for r in snapshot_diff(old, new, "k", ["v"]).collect()
    }
    assert sub == {
        5: ("removed", ""),
        6: ("added", ""),
        7: ("changed", "v"),
    }
    with pytest.raises(ValueError):
        snapshot_diff(old, new, "k", ["nope"])


def test_scd2_intervals_collapse_and_guard(spark):
    """Identical consecutive states collapse; value->NULL->value opens
    three intervals; open interval flags is_current; duplicate ts within
    a key raises at run time."""
    import pytest

    from kgforge.operators.diff import scd2_intervals

    rows = [
        (1, 0, "a"), (1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "a"),
        (2, 0, None), (2, 1, "x"), (2, 2, None),
        (3, 5, "only"),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, s string")
    got = {
        (r.k, r.valid_from): (r.s, r.valid_to, r.is_current)
        for r in scd2_intervals(df, "k", "ts", ["s"]).collect()
    }
    assert got == {
        (1, 0): ("a", 2, False),
        (1, 2): ("b", 4, False),
        (1, 4): ("a", None, True),
        (2, 0): (None, 1, False),
        (2, 1): ("x", 2, False),
        (2, 2): (None, None, True),
        (3, 5): ("only", None, True),
    }
    dup = spark.createDataFrame(
        [(1, 0, "a"), (1, 0, "b")], "k long, ts long, s string"
    )
    with pytest.raises(Exception, match="two states at one instant"):
        scd2_intervals(dup, "k", "ts", ["s"]).collect()
