"""Host-bucketed / range-partitioned page-table layouts (north-star S8/S9).

The target deployment stores the crawl as an Iceberg table range/bucket
partitioned on url-host so host-keyed joins (entity linking, per-host
dedup, host statistics) co-locate without a shuffle. This module is the
open-parquet analogue of that layout, usable on any Spark catalog:

- :func:`write_bucketed` — hash-bucket a DataFrame on a key column into a
  session-catalog table (Spark bucketed-table layout, external ``path`` so
  nothing lands in the default warehouse). Two tables bucketed on the same
  key with the same bucket count join with ZERO Exchange: the bucketed scan
  itself reports the hash distribution, so Catalyst plans a SortMergeJoin
  with no shuffle on either side. tests/test_bucketed_layout.py asserts
  this on the physical plan (and that the un-bucketed twin DOES shuffle).
- :func:`write_range_partitioned` — ``repartitionByRange`` + parquet:
  key-contiguous files whose parquet footer min/max statistics let the
  scan skip whole files for key-range predicates (host-range scans).
  :func:`file_ranges` reads those footers back as evidence.

Partition-on-host vs bucket-on-host: a Zipf-headed crawl must NOT use
``partitionBy("url_host")`` (directory per host => millions of dirs, and
the head host's directory is one giant skewed partition). Hash-bucketing
spreads each host's rows over a FIXED bucket count while keeping
join-alignment; that is why this module buckets rather than dir-partitions.
Reference scope note: the reference SDK holds the whole graph in one
FalkorDB instance and has no table-layout story at all
(/root/reference/graphrag_sdk/kg.py); layout-for-scale is engine-new.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str = "url_host",
    n_buckets: int = 64,
    sort_cols: tuple[str, ...] | None = None,
    mode: str = "overwrite",
) -> str:
    """Write ``df`` as a bucketed external table; returns the table name.

    ``path`` makes the table EXTERNAL: data lives under ``path``, only the
    (in-memory or Hive) catalog entry records the bucket spec. Joins between
    tables bucketed on the same key with the same ``n_buckets`` skip the
    shuffle entirely. ``sort_cols`` defaults to the bucket column so the
    per-file sort order also covers the join key (Spark still inserts a
    cheap per-partition Sort when files-per-bucket > 1; never an Exchange).
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(*(sort_cols or (bucket_col,)))
    )
    writer.saveAsTable(table)
    return table


def write_range_partitioned(
    df: DataFrame,
    path: str,
    col: str = "url_host",
    n_partitions: int = 32,
    mode: str = "overwrite",
) -> str:
    """Range-partition ``df`` on ``col`` and write parquet; returns ``path``.

    ``repartitionByRange`` samples the key distribution and assigns
    contiguous key ranges to partitions, so every output file covers a
    disjoint-or-boundary-touching key interval. Parquet footers then carry
    tight min/max for ``col`` and a key-range filter prunes whole files at
    scan time (verified via :func:`file_ranges` in the tests).
    """
    (
        df.repartitionByRange(n_partitions, F.col(col))
        .sortWithinPartitions(col)
        .write.mode(mode)
        .parquet(path)
    )
    return path


def file_ranges(path: str, col: str) -> list[tuple[str, str, str]]:
    """Per-file (file, min, max) footer statistics for ``col`` under ``path``.

    Footer-only (no data read) — the same metadata the scan's file-skipping
    uses; returned sorted by min so tests can assert disjoint coverage.
    """
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        meta = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(meta.num_row_groups):
            row_group = meta.row_group(rg)
            for ci in range(row_group.num_columns):
                c = row_group.column(ci)
                if c.path_in_schema != col or c.statistics is None:
                    continue
                s = c.statistics
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            out.append((os.path.basename(f), lo, hi))
    return sorted(out, key=lambda t: t[1])


def cogrouped(spark: SparkSession, left: str, right: str, on) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key."""
    return spark.table(left).join(spark.table(right), on=on)
