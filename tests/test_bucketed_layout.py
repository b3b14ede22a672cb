"""Bucketed / range-partitioned url_host table layouts (north-star parity).

Asserts the SCALE property itself, not just values: the co-located join
plan over two host-bucketed tables contains no Exchange (the bucketed scan
provides the hash distribution), while the identical join over plain
parquet does shuffle both sides.
"""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from kgforge.sinks import bucketed as B


def _pages(spark, n=400):
    # 20 hosts with a heavy head: 1/4 of ids collapse onto host-0
    host_ix = F.when(F.col("id") % 4 == 0, F.lit(0)).otherwise(
        F.col("id") % 20
    )
    host = F.concat(F.lit("host-"), host_ix.cast("string"), F.lit(".example"))
    return spark.range(n).select(
        F.concat(
            F.lit("https://"), host, F.lit("/p/"), F.col("id").cast("string")
        ).alias("url"),
        host.alias("url_host"),
        (F.col("id") * 37 % 1000).alias("n_chars"),
    )


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, workdir, no_broadcast):
    pages = _pages(spark)
    stats = pages.groupBy("url_host").agg(F.count("*").alias("n_pages"))
    B.write_bucketed(
        pages, "tb_pages", f"{workdir}/pages_b", n_buckets=8
    )
    B.write_bucketed(
        stats, "tb_stats", f"{workdir}/stats_b", n_buckets=8
    )
    joined = B.cogrouped(spark, "tb_pages", "tb_stats", on="url_host")
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan  # the whole point of the layout
    # and the values still match the plain-parquet join
    plain = pages.join(stats, on="url_host")
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_unbucketed_twin_does_shuffle(spark, workdir, no_broadcast):
    # control: same join over plain parquet must contain Exchange, proving
    # the no-Exchange assertion above is detecting the bucketed layout and
    # not a quirk of the plan printer
    pages = _pages(spark)
    stats = pages.groupBy("url_host").agg(F.count("*").alias("n_pages"))
    pages.write.mode("overwrite").parquet(f"{workdir}/pages_p")
    stats.write.mode("overwrite").parquet(f"{workdir}/stats_p")
    joined = spark.read.parquet(f"{workdir}/pages_p").join(
        spark.read.parquet(f"{workdir}/stats_p"), on="url_host"
    )
    plan = _plan(joined)
    assert "Exchange" in plan and "hashpartitioning" in plan


def test_range_partitioned_files_are_disjoint(spark, workdir):
    path = B.write_range_partitioned(
        _pages(spark, n=2000), f"{workdir}/pages_r", col="url_host",
        n_partitions=6,
    )
    ranges = B.file_ranges(path, "url_host")
    assert len(ranges) >= 3  # range planner may coalesce tiny tails
    for (_, _, prev_hi), (_, cur_lo, _) in zip(ranges, ranges[1:]):
        # contiguous key intervals: overlap at most at the boundary key
        assert cur_lo >= prev_hi
    # full coverage: reading back loses nothing
    assert spark.read.parquet(path).count() == 2000
