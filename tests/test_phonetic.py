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
