"""Grouped exact linear-fit sums — distributed OLS without float drift.

The scalable formulation of per-group trend fitting (SciPy `linregress`,
Spark MLlib `LinearRegression` for the 1-D case): ONE map-side-combining
hash aggregate computes the five sufficient statistics
(n, Σx, Σy, Σxy, Σx², Σy²) per group, and slope / intercept / r² derive
from closed-form determinants of those sums. At 100 TB this is the only
shape that works — a single scan, partial aggregation on every executor,
state per group = six numbers, no iterative solver, no driver data.

Exactness (the repo's standing float-sum rule): inputs are integer
columns (callers pre-scale, e.g. cents), sums accumulate in
DECIMAL(38,0) (Σy² at cent scale overflows BIGINT), and the emitted
columns are the integer DETERMINANTS

    slope_num = n·Σxy − Σx·Σy      slope_den = n·Σx² − (Σx)²
    syy_det   = n·Σy² − (Σy)²

so slope = slope_num/slope_den, intercept = (Σy − slope_num/slope_den·Σx)/n
and r² = slope_num² / (slope_den·syy_det) derive losslessly at read time.
Emitting the rational pieces instead of float quotients keeps the result
a pure data function — order-independent, mergeable (the sums are CRDT
adds, same as functions/sketch.py::moments_sketch), and hash-exact
against a DuckDB HUGEINT oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def linfit_sums(
    df: DataFrame,
    group_cols: list[str],
    x_col: str | Column,
    y_col: str | Column,
) -> DataFrame:
    """-> group_cols + (n, sx, sy, slope_num, slope_den, syy_det).

    ``x_col``/``y_col`` must already be integer-valued columns (cast or
    scale before calling). One hash aggregate; the determinants are
    DECIMAL(38,0) products of the partial sums.
    """
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast(_DEC)
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast(_DEC)
    d = df.select(*group_cols, x.alias("__x"), y.alias("__y"))
    xx, yy = F.col("__x"), F.col("__y")
    agg = d.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(xx).cast(_DEC).alias("sx"),
        F.sum(yy).cast(_DEC).alias("sy"),
        F.sum(xx * yy).cast(_DEC).alias("sxy"),
        F.sum(xx * xx).cast(_DEC).alias("sxx"),
        F.sum(yy * yy).cast(_DEC).alias("syy"),
    )
    n = F.col("n").cast(_DEC)
    return agg.select(
        *group_cols,
        "n",
        "sx",
        "sy",
        (n * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast(_DEC)
        .alias("slope_num"),
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast(_DEC)
        .alias("slope_den"),
        (n * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast(_DEC)
        .alias("syy_det"),
    )


def linfit_eval(sums: DataFrame) -> DataFrame:
    """Derive float slope / intercept / r² from the exact sums — the
    read-time view (floats appear HERE, after all aggregation, so the
    quotients are deterministic functions of exact integers)."""
    num = F.col("slope_num").cast("double")
    den = F.col("slope_den").cast("double")
    slope = F.when(F.col("slope_den") != 0, num / den)
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    r2 = F.when(
        (F.col("slope_den") != 0) & (F.col("syy_det") != 0),
        num * num / (den * F.col("syy_det").cast("double")),
    )
    return sums.select(
        *[c for c in sums.columns],
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def chisq_sums(
    df: DataFrame, row_col: str | Column, col_col: str | Column
) -> DataFrame:
    """Chi-square contingency decomposition — exact integer sufficient
    statistics for the independence test of two categorical columns
    (feature-vs-label screening in a training-data pipeline; the
    scipy.stats.chi2_contingency shape).

    Emits ONE row per (row_key, col_key) cell of the FULL grid —
    including never-observed combinations, whose expected counts still
    contribute to the statistic — with

        o        observed count (0 for absent cells)
        row_tot, col_tot, n   the marginals
        det      n·o − row_tot·col_tot   (DECIMAL(38,0), exact)

    so chi² = Σ det² / (n · row_tot · col_tot) and Cramér's V derive
    losslessly at read time — floats never enter the aggregation (the
    repo's standing float rule).

    Shape: ONE map-side-combining hash aggregate over the data produces
    the cell counts; marginals, n, and the grid (distinct-rows ×
    distinct-cols cross join) all derive from that CELL table, which is
    |rows|·|cols| — category-cardinality-scale, never data-scale. No
    second scan, no Python.
    """
    r = (F.col(row_col) if isinstance(row_col, str) else row_col).alias(
        "row_key"
    )
    c = (F.col(col_col) if isinstance(col_col, str) else col_col).alias(
        "col_key"
    )
    cells = df.select(r, c).groupBy("row_key", "col_key").agg(
        F.count("*").cast("long").alias("o")
    )
    from kgforge.cache import persist_tracked

    cells = persist_tracked(cells)
    rtot = cells.groupBy("row_key").agg(
        F.sum("o").cast("long").alias("row_tot")
    )
    ctot = cells.groupBy("col_key").agg(
        F.sum("o").cast("long").alias("col_tot")
    )
    n = cells.agg(F.sum("o").cast("long").alias("n"))
    grid = rtot.crossJoin(ctot).crossJoin(F.broadcast(n))
    out = grid.join(cells, on=["row_key", "col_key"], how="left").select(
        "row_key",
        "col_key",
        F.coalesce(F.col("o"), F.lit(0)).cast("long").alias("o"),
        "row_tot",
        "col_tot",
        "n",
        (
            F.col("n").cast(_DEC)
            * F.coalesce(F.col("o"), F.lit(0)).cast(_DEC)
            - F.col("row_tot").cast(_DEC) * F.col("col_tot").cast(_DEC)
        )
        .cast(_DEC)
        .alias("det"),
    )
    return out


def chisq_eval(cells: DataFrame) -> DataFrame:
    """Read-time chi² statistic from chisq_sums' exact cells: one row
    (n, dof, chi2, cramers_v). Floats appear HERE, after all counts."""
    term = (
        F.col("det").cast("double")
        * F.col("det").cast("double")
        / (
            F.col("n").cast("double")
            * F.col("row_tot").cast("double")
            * F.col("col_tot").cast("double")
        )
    )
    agg = cells.agg(
        F.max("n").cast("long").alias("n"),
        F.sum(term).alias("chi2"),
        F.count_distinct("row_key").cast("long").alias("nr"),
        F.count_distinct("col_key").cast("long").alias("nc"),
    )
    return agg.select(
        "n",
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
        "chi2",
        F.sqrt(
            F.col("chi2")
            / (
                F.col("n").cast("double")
                * F.least(F.col("nr") - 1, F.col("nc") - 1).cast("double")
            )
        ).alias("cramers_v"),
    )
