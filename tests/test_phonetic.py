"""Portable Soundex: NARA vector, Spark-builtin agreement, blocking join."""

import pytest


NARA = [
    ("Robert", "R163"), ("Rupert", "R163"),
    ("Ashcraft", "A261"), ("Ashcroft", "A261"),   # H/W transparency
    ("Tymczak", "T522"),                           # vowel blocks collapse
    ("Pfister", "P236"),                           # first-letter code merges
    ("Honeyman", "H555"),
    ("Smith", "S530"), ("Smyth", "S530"),
    ("Washington", "W252"), ("Lee", "L000"),
    ("o'brien", "O165"), ("", None), ("123", None),
]


def test_soundex_nara_vector_and_spark_builtin_agreement(spark):
    from pyspark.sql import functions as F

    from kgforge.functions.phonetic import soundex_portable

    df = spark.createDataFrame(
        [(i, w) for i, (w, _) in enumerate(NARA)], "i long, w string"
    )
    got = {
        r.i: r.s
        for r in df.select("i", soundex_portable(F.col("w")).alias("s")).collect()
    }
    for i, (w, want) in enumerate(NARA):
        assert got[i] == want, (w, got[i], want)

    # agreement with Spark's JVM soundex on clean alphabetic words
    words = [w for w, want in NARA if want] + [
        "Jackson", "Gutierrez", "Pfeiffer", "VanDeusen", "Knuth",
        "Kant", "Lloyd", "Ladd", "Schwarz", "Czarkowska",
    ]
    wdf = spark.createDataFrame([(w,) for w in words], "w string")
    both = wdf.select(
        "w",
        soundex_portable(F.col("w")).alias("mine"),
        F.soundex(F.col("w")).alias("jvm"),
    ).collect()
    mismatches = [(r.w, r.mine, r.jvm) for r in both if r.mine != r.jvm]
    assert not mismatches, mismatches


def test_soundex_blocking_pairs(spark):
    from kgforge.functions.phonetic import soundex_blocks

    df = spark.createDataFrame(
        [
            (1, "Smith"), (2, "Smyth"), (3, "Jones"),
            (4, "Jonas"), (5, "Johnson"), (6, "!!!"),
        ],
        "id long, name string",
    )
    got = {(r.id_a, r.id_b) for r in soundex_blocks(df, "name", "id").collect()}
    assert (1, 2) in got         # Smith/Smyth block together
    assert (3, 4) in got         # Jones/Jonas
    assert not any(6 in p for p in got)  # no-letter name drops out
    assert (1, 3) not in got


def test_fuzzy_join_blocked_matches_and_misses(spark):
    from kgforge.functions.phonetic import fuzzy_join

    left = spark.createDataFrame(
        [(1, "smith"), (2, "robert"), (3, "window"), (4, "table")],
        "lid long, lname string",
    )
    right = spark.createDataFrame(
        [
            (10, "smyth"),    # soundex hit, dist 1
            (11, "rupert"),   # soundex hit, dist 2
            (12, "windows"),  # prefix hit, dist 1
            (13, "xable"),    # first-letter typo: soundex+prefix MISS
            (14, "zzzzz"),    # no match at all
        ],
        "rid long, rname string",
    )
    got = {
        (r.lname, r.rname, r.lev_dist)
        for r in fuzzy_join(left, right, "lname", "rname", max_dist=2).collect()
    }
    assert ("smith", "smyth", 1) in got
    assert ("robert", "rupert", 2) in got
    assert ("window", "windows", 1) in got
    # blocked out by both channels despite dist 1 — documented recall bound
    assert not any(r == "xable" for (_, r, _) in got)
    # the suffix channel recovers the first-letter typo
    got3 = {
        (r.lname, r.rname)
        for r in fuzzy_join(
            left, right, "lname", "rname", max_dist=2,
            blocks=("soundex", "prefix", "suffix"),
        ).collect()
    }
    assert ("table", "xable") in got3
    # every emitted pair respects max_dist and carries both sides' columns
    out = fuzzy_join(left, right, "lname", "rname", max_dist=1)
    assert set(out.columns) == {"lid", "lname", "rid", "rname", "lev_dist"}
    assert all(r.lev_dist <= 1 for r in out.collect())


def test_fuzzy_join_pairs_dedup_across_channels(spark):
    from kgforge.functions.phonetic import fuzzy_join

    # 'smith'/'smyth' matches BOTH soundex and suffix channels -> one row
    left = spark.createDataFrame([(1, "smith")], "lid long, lname string")
    right = spark.createDataFrame([(2, "smith")], "rid long, rname string")
    rows = fuzzy_join(
        left, right, "lname", "rname", max_dist=0,
        blocks=("soundex", "prefix", "suffix"),
    ).collect()
    assert len(rows) == 1 and rows[0].lev_dist == 0


def test_fuzzy_join_max_block_caps_hot_key(spark):
    from kgforge.functions.phonetic import fuzzy_join

    # 6 identical-soundex left rows x 6 right rows: uncapped = 36
    # candidate pairs; max_block=2 bounds each side to 2 per key.
    left = spark.createDataFrame(
        [(i, f"smith{i}") for i in range(6)], "lid long, lname string"
    )
    right = spark.createDataFrame(
        [(i, f"smith{i}") for i in range(6)], "rid long, rname string"
    )
    full = fuzzy_join(
        left, right, "lname", "rname", max_dist=2, blocks=("soundex",)
    )
    capped = fuzzy_join(
        left, right, "lname", "rname", max_dist=2,
        blocks=("soundex",), max_block=2,
    )
    assert full.count() == 36
    # deterministic cap: lexicographically-first 2 per side -> 4 pairs
    got = {(r.lname, r.rname) for r in capped.collect()}
    assert got == {
        ("smith0", "smith0"), ("smith0", "smith1"),
        ("smith1", "smith0"), ("smith1", "smith1"),
    }


def test_fuzzy_join_guards(spark):
    from kgforge.functions.phonetic import fuzzy_join

    df = spark.createDataFrame([(1, "a")], "id long, name string")
    other = spark.createDataFrame([(2, "b")], "id long, oname string")
    with pytest.raises(ValueError, match="overlapping"):
        fuzzy_join(df, other, "name", "oname")
    ok = spark.createDataFrame([(2, "b")], "rid long, rname string")
    with pytest.raises(ValueError, match="unknown block"):
        fuzzy_join(df, ok, "name", "rname", blocks=("nope",))
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_join(df, ok, "name", "rname", max_dist=-1)
