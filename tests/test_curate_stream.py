"""Streaming curation gates: stream-vs-batch gate parity, repetition-UDF
parity with the batch explode+agg implementation, scrub-on-stream
(kgforge/streaming/curate.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgforge.streaming.curate import curate_stream

ROWS = [
    # kept: clean english
    (1, "2024-01-01 10:00:00",
     "the of and research harbor signal window garden travel stone"),
    # dropped: language
    (2, "2024-01-01 10:01:00", "zxq pqr mnl trk vsn wrd qpt lmn"),
    # dropped: quality (too short)
    (3, "2024-01-01 10:02:00", "the of and"),
    # dropped: repetition (top bigram dominates)
    (4, "2024-01-01 10:03:00", "the of and " + "click here " * 10),
    # kept, then scrubbed
    (5, "2024-01-01 10:04:00",
     "the of and contact sam.lee@corp.example.com for river music data"),
    # dropped: exact dup of doc 1 within the watermark (case variant)
    (6, "2024-01-01 10:30:00",
     "THE of and research harbor signal window garden travel stone"),
]


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, ts string, text string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_stream_gates_match_batch_funnel(spark, workdir):
    src = f"{workdir}/curate_src"
    _docs(spark, ROWS).coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .parquet(src)
    )
    out = curate_stream(
        stream, max_top_bigram_pct=30, max_dup_line_pct=50, scrub=True
    )
    q = (
        out.writeStream.format("memory")
        .queryName("curated")
        .outputMode("append")
        .option("checkpointLocation", f"{workdir}/curate_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r.doc_id: r.text for r in spark.table("curated").collect()}
    assert set(got) == {1, 5}
    assert "<EMAIL>" in got[5] and "sam.lee" not in got[5]

    # batch-funnel parity on the SAME rows (audit names every drop;
    # batch dedup is unbounded-lookback, same answer here)
    from kgforge.functions.curate import curate_documents

    kept, audit = curate_documents(
        _docs(spark, ROWS),
        max_top_bigram_pct=30,
        max_dup_line_pct=50,
        scrub=True,
        near_dup=False,
    )
    assert {r.doc_id for r in kept.collect()} == set(got)
    assert {r.id: r.reason for r in audit.collect()} == {
        2: "lang", 3: "quality", 4: "repetition", 6: "exact_dup",
    }


def test_repetition_udf_matches_batch_operator(spark):
    """The per-row pandas UDF and the batch explode+agg implementation
    must produce identical counters on the same texts."""
    from kgforge.functions.textstats import repetition_stats
    from kgforge.streaming.curate import _repetition_row

    rows = [
        (1, "click here\nclick here\nbuy now\nclick here"),
        (2, "alpha beta\ngamma delta"),
        (3, "word"),
        (4, ""),
        (5, None),
        (6, "a b a b a b a\nb a b a"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    batch = {
        r.doc_id: (r.n_lines, r.n_distinct_lines, r.n_bigrams,
                   r.top_bigram_n)
        for r in repetition_stats(df).collect()
    }
    via_udf = {
        r.doc_id: (r.rep.n_lines, r.rep.n_distinct_lines,
                   r.rep.n_bigrams, r.rep.top_bigram_n)
        for r in df.select(
            "doc_id", _repetition_row(F.col("text")).alias("rep")
        ).collect()
    }
    # batch: NULL text -> NULL line stats, 0 bigram stats (left join)
    assert batch == via_udf
