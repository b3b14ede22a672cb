"""Phonetic blocking keys — portable American Soundex (NARA rules).

Entity-linking blockers need a key that survives spelling variation
(Smith/Smyth, Johnson/Jonson). Soundex is the classic: first letter +
three digits of consonant classes. Spark ships `F.soundex`, but its JVM
implementation can't run inside a DuckDB oracle — and RE2 (DuckDB's
regex engine) has NO backreferences, so the usual collapse-duplicates
regex is out. This module derives the code from a chain of translate +
backref-free regexp_replace steps that BOTH engines evaluate
identically (the scrub.py portability rule):

1. strip non-letters, uppercase;
2. translate letters to classes: vowels+Y -> '.' (collapse BLOCKER),
   H/W -> '-' (collapse-TRANSPARENT, the NARA rule people get wrong),
   consonants -> 1-6;
3. per digit d: collapse ``d(-*d)+`` runs to ``d`` (same code through
   H/W merges; through vowels does not);
4. drop position 1 (the first letter's own code — already merged into
   any following equal code by step 3), strip separators, take 3
   digits, zero-pad.

NARA test vector (pytest-pinned): Robert/Rupert -> R163,
Ashcraft/Ashcroft -> A261, Tymczak -> T522, Pfister -> P236,
Honeyman -> H555.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
#        A B C D E F G H I J K L M N O P Q R S T U V W X Y Z
_CODES = ".123.12-.22455.12623.1-2.2"


def soundex_portable(name: Column) -> Column:
    """American Soundex (NARA H/W rule) as engine-portable expressions;
    NULL for inputs with no letters."""
    u = F.upper(F.regexp_replace(name, "[^A-Za-z]", ""))
    t = F.translate(u, _ALPHA, _CODES)
    for d in "123456":
        t = F.regexp_replace(t, f"{d}(?:-*{d})+", d)
    tail = F.regexp_replace(F.substring(t, 2, 1_000_000), "[.-]", "")
    code = F.concat(
        F.substring(u, 1, 1), F.rpad(F.substring(tail, 1, 3), 3, "0")
    )
    return F.when(F.length(u) > 0, code)


def soundex_blocks(
    df: DataFrame, name_col: str, id_col: str
) -> DataFrame:
    """Blocking-pair candidates: ids sharing a Soundex key ->
    (sdx, id_a, id_b), id_a < id_b. The standard record-linkage
    pre-filter: the equi-join on the phonetic key replaces the all-pairs
    name comparison."""
    keyed = df.select(
        F.col(id_col).alias("id"),
        soundex_portable(F.col(name_col)).alias("sdx"),
    ).where(F.col("sdx").isNotNull())
    a, b = keyed.alias("a"), keyed.alias("b")
    return a.join(
        b, (F.col("a.sdx") == F.col("b.sdx")) & (F.col("a.id") < F.col("b.id"))
    ).select(
        F.col("a.sdx").alias("sdx"),
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
    )


def _block_key(col: Column, block: str, prefix_len: int) -> Column:
    if block == "soundex":
        return soundex_portable(col)
    if block == "prefix":
        return F.substring(F.lower(col), 1, prefix_len)
    if block == "suffix":
        low = F.lower(col)
        return F.substring(low, -prefix_len, prefix_len)
    raise ValueError(f"unknown block channel: {block!r}")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    *,
    max_dist: int = 2,
    blocks: tuple = ("soundex", "prefix"),
    prefix_len: int = 4,
    max_block: int | None = None,
) -> DataFrame:
    """Blocked fuzzy (edit-distance) join: candidate pairs from one
    equi-join per blocking channel, verified with the JVM-side
    ``levenshtein`` — never the all-pairs cross product.

    Record linkage at corpus scale (merging entity aliases, vocab
    spelling variants, near-identical titles) cannot afford
    |L|x|R| distance evaluations. The classic fix is multi-pass
    blocking (Fellegi-Sunter practice; reference's entity resolution
    relies on MinHash blocking in operators/link.py — this is the
    string-edit counterpart for SHORT keys where shingles are too
    coarse): each channel maps both sides to a coarse key (Soundex
    class, lowercase prefix/suffix), candidates are the per-key
    equi-join, and the exact Levenshtein filter runs only on
    candidates. Recall is bounded by the channels — a pair blocked by
    every channel (e.g. a first-letter typo under soundex+prefix) is
    MISSED; add the "suffix" channel for first-letter noise. Distance
    is computed by ``F.levenshtein`` (classic DP, same semantics as
    DuckDB's ``levenshtein`` — the oracle runs the identical plan).

    At 100 TB: each channel is a shuffle on its block key; hot keys
    (common phonetic classes) square inside their block, so
    ``max_block`` caps per-key rows on BOTH sides with the windowed
    rank trick dedup.py uses for LSH buckets (deterministic:
    ties broken by the join value itself). Output carries every input
    column (names must be disjoint) plus ``lev_dist``.
    """
    dup = set(left.columns) & set(right.columns)
    if dup:
        raise ValueError(f"overlapping columns between sides: {sorted(dup)}")
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    from pyspark.sql import Window

    channels = []
    for block in blocks:
        lk = left.withColumn("__bk", _block_key(F.col(left_on), block, prefix_len))
        rk = right.withColumn("__bk", _block_key(F.col(right_on), block, prefix_len))
        if max_block is not None:
            wl = Window.partitionBy("__bk").orderBy(left_on)
            wr = Window.partitionBy("__bk").orderBy(right_on)
            lk = (
                lk.withColumn("__rn", F.row_number().over(wl))
                .where(F.col("__rn") <= max_block)
                .drop("__rn")
            )
            rk = (
                rk.withColumn("__rn", F.row_number().over(wr))
                .where(F.col("__rn") <= max_block)
                .drop("__rn")
            )
        channels.append(lk.join(rk, "__bk").drop("__bk"))
    cand = channels[0]
    for ch in channels[1:]:
        cand = cand.unionByName(ch)
    return (
        cand.dropDuplicates()
        .where(F.levenshtein(F.col(left_on), F.col(right_on)) <= max_dist)
        .withColumn(
            "lev_dist", F.levenshtein(F.col(left_on), F.col(right_on))
        )
    )
