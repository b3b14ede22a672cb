"""Dataset profiling — the ingest-time survey a pipeline runs BEFORE
trusting a new table (DuckDB ``SUMMARIZE`` / Spark ``df.summary`` shape,
but exact and hash-comparable).

- `profile_columns`: one row PER COLUMN with exact counts (rows, nulls,
  distincts) and lexical/numeric extrema rendered as strings — ONE scan
  of the table computes every column's aggregates in a single hash
  aggregate (no per-column jobs, no sampling); floats never enter (the
  repo's standing exactness rule: means/stddevs are a read-time concern
  over the exact sums families elsewhere in functions/).
- `inclusion_stats`: foreign-key discovery between a candidate child
  column and a candidate parent column: |distinct(child)|,
  |distinct(parent)|, |distinct(child) ∩ distinct(parent)| — the
  inclusion coefficient ∩/|child| = 1.0 certifies containment (an FK
  candidate), computed on the DISTINCT sets (two small aggregates + one
  semi-join), never on the raw rows.

Scale shape: `profile_columns` is a single map-side-combining aggregate
emitting |columns| structs from ONE pass — at 100 TB the scan dominates
and is paid once; exact count_distinct shuffles per column inside the
same aggregate (callers profiling trillion-distinct columns should use
the sketch family instead — documented trade, not a silent estimate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """-> (col_name, n_rows, n_nulls, n_distinct, min_str, max_str) with
    one row per profiled column; extrema are the column's own
    type-ordered min/max rendered to strings (so a single schema holds
    every column type; NULL for all-null columns)."""
    cols = columns or df.columns
    aggs = [F.count("*").cast("long").alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long"))
            .cast("long")
            .alias(f"__nulls_{c}"),
            F.count_distinct(F.col(c)).cast("long").alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_str"),
            F.col(f"__mx_{c}").alias("max_str"),
        )
        for c in cols
    ]
    return one.select(
        F.explode(F.array(*structs)).alias("p")
    ).select("p.*")


def inclusion_stats(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
) -> DataFrame:
    """-> ONE row (n_child_distinct, n_parent_distinct, n_contained):
    distinct non-null child values, distinct non-null parent values,
    and how many child values exist in the parent — the FK-candidate
    inclusion test. n_contained == n_child_distinct certifies
    containment; the coefficient is a read-time ratio."""
    c = (
        child.select(F.col(child_col).alias("v"))
        .where(F.col("v").isNotNull())
        .dropDuplicates()
    )
    p = (
        parent.select(F.col(parent_col).alias("v"))
        .where(F.col("v").isNotNull())
        .dropDuplicates()
    )
    from kgforge.cache import persist_tracked

    c = persist_tracked(c)
    inter = c.join(p, on="v", how="left_semi")
    return (
        c.agg(F.count("*").cast("long").alias("n_child_distinct"))
        .crossJoin(
            p.agg(F.count("*").cast("long").alias("n_parent_distinct"))
        )
        .crossJoin(
            inter.agg(F.count("*").cast("long").alias("n_contained"))
        )
    )
