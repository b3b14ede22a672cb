"""Bucket-granular resume: a mid-stage crash only recomputes the buckets
whose lineage never committed; partial bucket files are replaced, never
duplicated."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgforge.plans.lineage import RunContext


def _transform(df):
    return df.withColumn("out", F.length("payload"))


def _input(spark, n=400):
    return spark.range(n).select(
        F.concat(F.lit("https://h/"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("payload"),
    )


def test_partial_buckets_skip_on_resume(spark, workdir):
    inp = _input(spark)
    # run 1 processes only a subset of the input (simulating the committed
    # portion of a crashed run: its buckets' lineage rows ARE committed)
    ctx1 = RunContext(spark, workdir)
    part = inp.filter(F.pmod(F.xxhash64("url"), F.lit(64)) < 20)
    ctx1.run_stage_bucketed("02_ir", part, _transform, n_buckets=64)
    done1 = ctx1.stage_buckets("02_ir")
    assert 0 < len(done1) <= 20

    # wipe the stage-complete marker so run 2 resumes instead of reusing
    lin = spark.read.parquet(f"{workdir}/_lineage").filter(
        ~((F.col("stage") == "02_ir") & (F.col("status") == "stage_complete"))
    ).localCheckpoint()
    lin.write.mode("overwrite").parquet(f"{workdir}/_lineage")

    # run 2 sees the full input; completed buckets must be attributed to
    # run 1 (skipped), the rest to run 2
    ctx2 = RunContext(spark, workdir)
    out = ctx2.run_stage_bucketed("02_ir", inp, _transform, n_buckets=64)
    assert out.count() == 400
    done2 = ctx2.stage_buckets("02_ir")
    nonempty = {
        r.b
        for r in inp.select(
            F.pmod(F.xxhash64("url"), F.lit(64)).alias("b")
        ).distinct().collect()
    }
    assert set(done2) == nonempty  # every non-empty bucket committed
    for b in done1:
        assert done2[b] == ctx1.run_id, "completed bucket was recomputed"
    assert any(r == ctx2.run_id for r in done2.values())

    # values correct and no duplicates
    assert out.select("url").distinct().count() == 400
    bad = out.filter(F.col("out") != F.length("payload")).count()
    assert bad == 0

    # run 3: everything complete -> pure read, no new lineage buckets
    ctx3 = RunContext(spark, workdir)
    out3 = ctx3.run_stage_bucketed("02_ir", inp, _transform, n_buckets=64)
    assert out3.count() == 400
    assert ctx3.run_id not in set(ctx3.stage_buckets("02_ir").values())


def test_partial_files_without_lineage_are_replaced(spark, workdir):
    """A bucket dir written by a crashed job (no lineage row) is overwritten
    by dynamic partition overwrite — not appended to."""
    inp = _input(spark, 100)
    # fake a crashed write: bucket files exist, no lineage at all
    fake = inp.limit(50).withColumn(
        "out", F.lit(-1)
    ).withColumn("bucket", F.pmod(F.xxhash64("url"), F.lit(8)))
    fake.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{workdir}/02_ir"
    )
    ctx = RunContext(spark, workdir)
    out = ctx.run_stage_bucketed("02_ir", inp, _transform, n_buckets=8)
    assert out.count() == 100
    assert out.filter(F.col("out") == -1).count() == 0


def test_footer_counters_match_scan(spark, workdir):
    """Lineage counters now come from parquet footers (no second scan,
    VERDICT r02 #3); they must equal what a real scan reports."""
    from kgforge.plans.lineage import _footer_counts

    ctx = RunContext(spark, f"{workdir}/plain")
    inp = _input(spark, 1000)
    out = ctx.run_stage(
        "01_x", lambda: _transform(inp), repartition_col="url",
        num_partitions=4,
    )
    lin = ctx.lineage()
    # per-partition rows are tagged with the counting mode that produced
    # them (ADVICE r03: footer file-part indexes and scan partition ids
    # are different numberings) — local files have readable footers
    parts = {
        r.partition_id: r.rows
        for r in lin.filter(
            F.col("status").startswith("partition")
        ).collect()
    }
    assert sum(parts.values()) == 1000
    modes = {
        r.status
        for r in lin.filter(
            F.col("status").startswith("partition")
        ).collect()
    }
    assert modes == {"partition_footer"}
    total = lin.filter(F.col("status") == "stage_complete").collect()
    assert len(total) == 1 and total[0].rows == 1000
    # per-file footer counts == per-file scan counts (the old method)
    scan = {
        r.f: r.n
        for r in out.groupBy(F.input_file_name().alias("f"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    footer = _footer_counts(ctx.stage_path("01_x"))
    assert {k.split("/")[-1] for k in footer} == {
        k.split("/")[-1] for k in scan
    }
    assert sorted(footer.values()) == sorted(scan.values())


def test_footer_counters_bucketed_match_scan(spark, workdir):
    ctx = RunContext(spark, f"{workdir}/bucketed")
    inp = _input(spark, 600)
    out = ctx.run_stage_bucketed("02_x", inp, _transform, n_buckets=16)
    assert out.count() == 600
    lin = ctx.lineage()
    per_bucket = {
        r.partition_id: r.rows
        for r in lin.filter(F.col("status") == "bucket_complete").collect()
    }
    scan = {
        int(r.bucket): r.n
        for r in spark.read.parquet(ctx.stage_path("02_x"))
        .groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    assert per_bucket == scan
    total = lin.filter(
        (F.col("stage") == "02_x") & (F.col("status") == "stage_complete")
    ).collect()
    assert total[0].rows == 600
