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
