"""Small-file compaction (sinks/compact.py): bin-planning math and the
real parquet file mover — file counts, row preservation, one-file-per-
bin, flatten layout."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kgforge.sinks.compact import compact_parquet, plan_bins


def _manifest(spark, rows):
    return spark.createDataFrame(rows, "path string, bytes long")


def test_plan_bins_next_fit_boundaries(spark):
    # target 100: cumulative priors 0,60,120,180 -> bins 0,0,1,1
    plan = {
        r.path: r.bin
        for r in plan_bins(
            _manifest(
                spark,
                [("a", 60), ("b", 60), ("c", 60), ("d", 60)],
            ),
            100,
        ).collect()
    }
    assert plan == {"a": 0, "b": 0, "c": 1, "d": 1}


def test_plan_bins_straddler_joins_earlier_bin(spark):
    # big file at prior 10 -> bin 0 even though it overshoots target
    plan = {
        r.path: r.bin
        for r in plan_bins(
            _manifest(spark, [("a", 10), ("b", 500), ("c", 10)]), 100
        ).collect()
    }
    assert plan == {"a": 0, "b": 0, "c": 5}


def test_plan_bins_order_is_path_not_input(spark):
    plan = {
        r.path: r.bin
        for r in plan_bins(
            _manifest(spark, [("z", 80), ("a", 80)]), 100
        ).collect()
    }
    assert plan == {"a": 0, "z": 0}  # prior of z is 80, 80 div 100 = 0
    plan2 = {
        r.path: r.bin
        for r in plan_bins(
            _manifest(spark, [("z", 80), ("a", 150)]), 100
        ).collect()
    }
    assert plan2 == {"a": 0, "z": 1}


def test_plan_bins_rejects_nonpositive_target(spark):
    with pytest.raises(ValueError):
        plan_bins(_manifest(spark, [("a", 1)]), 0)


def test_compact_parquet_round_trip(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    df = spark.range(0, 300).withColumn("v", F.col("id") * 7)
    # 30 small files of 10 rows each
    df.repartitionByRange(30, "id").write.parquet(src)
    n_src = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_src == 30
    sizes = [
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src)
        if f.endswith(".parquet")
    ]
    target = sum(sizes) // 4
    plan = compact_parquet(spark, src, dst, target)
    out_files = sorted(
        f for f in os.listdir(dst) if f.endswith(".parquet")
    )
    n_bins = plan.agg(F.max("bin")).collect()[0][0] + 1
    # flattened: exactly one file per bin, far fewer than inputs
    assert len(out_files) == n_bins
    assert n_bins < n_src
    assert all(f.startswith("compacted-") for f in out_files)
    # every row survives with identical values
    back = spark.read.parquet(dst)
    assert back.count() == 300
    assert (
        back.select(F.sum("v")).collect()[0][0]
        == df.select(F.sum("v")).collect()[0][0]
    )
    assert sorted(back.columns) == ["id", "v"]


def test_compact_parquet_empty_dir_raises(spark, tmp_path):
    src = tmp_path / "empty"
    src.mkdir()
    with pytest.raises(ValueError):
        compact_parquet(spark, str(src), str(tmp_path / "out"), 1000)


def test_plan_bins_no_python_in_plan(spark):
    plan = plan_bins(
        _manifest(spark, [("a", 10), ("b", 20)]), 100
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
