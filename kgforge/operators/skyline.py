"""2-D skyline (Pareto front): rows no other row beats on both axes.

The multi-criteria shortlist operator (cheapest-AND-largest part, most
recent-AND-highest-quality document): p is dominated iff some q is at
least as good on both dimensions and strictly better on one; the
skyline is everything undominated. The naive formulation is a quadratic
NOT EXISTS self-join; in 2-D it collapses to an ordered prefix-min —
group rows by x, take each group's best y, and p is dominated exactly
when

    (prefix-min of group-best-y over STRICTLY better x)  <=  p.y
    OR (its own group's best y)                          <   p.y

Distribution: one hash aggregate to the per-x group minima, a
range-partitioned prefix-min over the (small) distinct-x table carried
through the driver one-row-per-partition (the functions/sharding.py::
_prior_running two-phase scheme), and one equi-join back on x. No
self-join, no single-partition global window. NOTE a rangeBetween(-1)
window would be wrong here: range-frame offsets are VALUE offsets
(exact only for integer keys, silently wrong for doubles), which is why
the strict-prev min is computed on the deduplicated x table with a ROWS
frame instead.

The driver gate's DuckDB oracle IS the quadratic NOT EXISTS definition,
so the pass is verified against first principles at both SFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DIRS = ("min", "max")


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_dir: str = "min",
    y_dir: str = "min",
    num_partitions: int | None = None,
) -> DataFrame:
    """Rows of ``df`` on the (x_col, y_col) Pareto front; ``x_dir`` /
    ``y_dir`` in {'min','max'} pick each axis' better direction. Rows
    with NULL in either column are dropped (they can neither dominate
    nor rank). Duplicate (x, y) points do not dominate each other —
    all copies of an undominated point survive (NOT EXISTS parity)."""
    if x_dir not in _DIRS or y_dir not in _DIRS:
        raise ValueError(f"directions must be in {_DIRS}")
    for c in ("__x", "__y", "__gm", "__pm", "__pid"):
        if c in df.columns:
            raise ValueError(f"reserved column {c!r} present in input")
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    xs = F.col(x_col) if x_dir == "min" else -F.col(x_col)
    ys = F.col(y_col) if y_dir == "min" else -F.col(y_col)
    base = (
        df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .withColumn("__x", xs)
        .withColumn("__y", ys)
    )
    # per-distinct-x best y (map-side-combining hash aggregate)
    g = base.groupBy("__x").agg(F.min("__y").alias("__gm"))
    # strict-prefix min of __gm in x order, two-phase (ROWS frame on the
    # deduplicated table — one row per x, so rowsBetween(-1) IS "x' < x")
    parts = (
        g.repartitionByRange(n, F.col("__x"))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()  # both phases must see one row->partition map
    )
    mins = sorted(
        parts.groupBy("__pid").agg(F.min("__gm").alias("__m")).collect(),
        key=lambda r: r["__pid"],
    )
    prefix, best = [], None
    for r in mins:
        prefix.append((r["__pid"], best))
        if best is None or (r["__m"] is not None and r["__m"] < best):
            best = r["__m"]
    pm_type = dict(parts.dtypes)["__gm"]
    pref_df = spark.createDataFrame(
        [(p, m) for p, m in prefix], f"__pid int, __pref {pm_type}"
    )
    w_prev = (
        Window.partitionBy("__pid")
        .orderBy("__x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g2 = (
        parts.join(F.broadcast(pref_df), on="__pid")
        .withColumn(
            # least() skips NULLs: first row / first partition compose
            "__pm", F.least(F.min("__gm").over(w_prev), F.col("__pref"))
        )
        .select("__x", "__gm", "__pm")
    )
    dominated = (
        (F.col("__pm").isNotNull() & (F.col("__pm") <= F.col("__y")))
        | (F.col("__gm") < F.col("__y"))
    )
    return (
        base.join(g2, on="__x")
        .where(~dominated)
        .drop("__x", "__y", "__gm", "__pm")
    )
