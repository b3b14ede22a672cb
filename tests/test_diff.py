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
