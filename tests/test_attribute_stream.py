"""Stream-stream interval-join attribution: batch/stream parity +
horizon semantics (streaming/enrich.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgforge.streaming.enrich import attribute

ROWS = [
    # (event_id, ts, user_id, kind)
    (1, "2024-01-01 10:00:00", 7, "trig"),
    (2, "2024-01-01 10:30:00", 7, "conv"),   # 30 min after 1 -> match
    (3, "2024-01-01 13:00:00", 7, "conv"),   # 3 h after 1 -> outside
    (4, "2024-01-01 10:00:00", 8, "trig"),
    (5, "2024-01-01 10:00:00", 8, "conv"),   # simultaneous -> no match
    (6, "2024-01-01 11:59:00", 8, "conv"),   # within 2 h of 4 -> match
    (7, "2024-01-01 11:00:00", 7, "trig"),
    # 3 is within 2 h of 7 -> match (one conv can attribute to many)
]


def _sides(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, kind string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    return df.filter("kind = 'trig'"), df.filter("kind = 'conv'")


EXPECT = {(7, 1, 2, 1800 * 10**6), (8, 4, 6, 7140 * 10**6),
          (7, 7, 3, 7200 * 10**6)}


def test_attribute_batch_semantics(spark):
    trig, conv = _sides(spark, ROWS)
    got = {
        (r.key, r.trig_id, r.conv_id, r.lag_us)
        for r in attribute(trig, conv, horizon="2 hours").collect()
    }
    assert got == EXPECT


def test_attribute_stream_matches_batch(spark, workdir):
    """The same rows through the watermarked stream-stream join give
    the same attribution set (availableNow, two file batches)."""
    trig, conv = _sides(spark, ROWS)
    tdir, cdir = f"{workdir}/att_trig", f"{workdir}/att_conv"
    trig.coalesce(1).write.mode("overwrite").parquet(tdir)
    conv.coalesce(1).write.mode("overwrite").parquet(cdir)
    schema = "event_id long, ts timestamp, user_id long, kind string"
    ts = spark.readStream.schema(schema).parquet(tdir)
    cs = spark.readStream.schema(schema).parquet(cdir)
    out = attribute(ts, cs, horizon="2 hours", watermark="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("att_out")
        .outputMode("append")
        .option("checkpointLocation", f"{workdir}/att_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.key, r.trig_id, r.conv_id, r.lag_us)
        for r in spark.table("att_out").collect()
    }
    assert got == EXPECT


def test_attribute_batch_plan_no_cartesian(spark):
    """The attribution join is an equi-join on key with a pushed range
    condition — never a cartesian/nested-loop product."""
    trig, conv = _sides(spark, ROWS)
    plan = (
        attribute(trig, conv)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
