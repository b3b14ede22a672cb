"""Embedding-column preparation: L2 normalization and int8 quantization.

Engine-new surface: before a 100 TB corpus's embeddings are ANN-indexed
or shipped to a trainer they are normalized (cosine becomes dot product)
and quantized (4x smaller, cache-resident). Both operators are pure
built-in column expressions over ``array<float>`` — `transform` /
`aggregate` higher-order functions, JVM-side, no Python on the row path.

Determinism note (why the ORACLE covers quantization but not
normalization): the quantizer's scale is a max of absolute values —
EXACT, order-free — and each element is then quantized independently in
double precision, so any engine reproduces it bit-for-bit
(`floor(x/scale*127 + 0.5)` is round-half-up in plain floor arithmetic).
The L2 norm, by contrast, is a floating SUM whose low bits depend on
accumulation order, which no cross-engine contract guarantees —
normalization is pytest-gated (unit norm, cosine invariance) instead.

Expensive arrays are materialized into real columns before any
`transform` that reuses them: higher-order-function subexpressions are
not CSE'd (CLAUDE.md invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def l2_normalize(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "vec_unit"
) -> DataFrame:
    """Add ``out_col`` = the unit-L2 vector (double elements).

    Zero vectors stay zero (no NaN poisoning downstream dot products).
    """
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    df = df.withColumn("__norm", norm)
    unit = F.transform(
        F.col(vec_col), lambda x: x.cast("double") / F.col("__norm")
    )
    zeros = F.transform(F.col(vec_col), lambda _: F.lit(0.0))
    return df.withColumn(
        out_col, F.when(F.col("__norm") > 0, unit).otherwise(zeros)
    ).drop("__norm")


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    scale_col: str = "q_scale",
    out_col: str = "q_vec",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``q = round_half_up(x /
    scale * 127)`` with ``scale = max(|x|)``, so q is in [-127, 127].

    Adds ``scale_col`` (double) and ``out_col`` (array<int>). A zero
    vector quantizes to zeros with scale 0. Reconstruction
    (`dequantize_int8`) is ``q * scale / 127`` with max elementwise
    error ``scale/254``.
    """
    df = df.withColumn(
        scale_col,
        F.array_max(
            F.transform(F.col(vec_col), lambda x: F.abs(x))
        ).cast("double"),
    )
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(
            x.cast("double") / F.col(scale_col) * 127 + F.lit(0.5)
        ).cast("int"),
    )
    zeros = F.transform(F.col(vec_col), lambda _: F.lit(0).cast("int"))
    return df.withColumn(
        out_col, F.when(F.col(scale_col) > 0, q).otherwise(zeros)
    )


def dequantize_int8(
    df: DataFrame,
    q_col: str = "q_vec",
    scale_col: str = "q_scale",
    out_col: str = "vec_approx",
) -> DataFrame:
    """Reconstruct ``array<double>`` from `quantize_int8` output."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(q_col),
            lambda q: q.cast("double") * F.col(scale_col) / 127,
        ),
    )
