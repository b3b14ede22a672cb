"""SparkSession factory with scale-oriented defaults.

The same configuration is used by tests (local[32]) and the two-parallelism
bench (local[8] vs local[32]); on a real cluster the master/shuffle-partition
settings come from spark-submit and everything else holds.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kgforge",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the kgforge pipeline.

    - AQE on (runtime coalescing + skew-join splitting — the reference has no
      skew story at all; hot entities like "United States" serialize its
      FalkorDB MERGEs, see /root/reference/graphrag_sdk/steps/extract_data_step.py:222).
    - Arrow on (every Python-side operator is a pandas/Arrow UDF; zero
      per-row Python on the hot path).
    - shuffle partitions sized to cores locally; on a cluster leave to AQE.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
