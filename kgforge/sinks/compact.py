"""Small-file compaction: bin-pack a directory of small parquet files
into ~target-size outputs.

The at-scale problem: long-running ingest (streaming micro-batches,
per-partition lineage restarts, bucketed writers) leaves thousands of
KB-sized parquet files per table; every downstream scan then pays one
task + one footer read per file, and the NameNode/object-store listing
itself becomes the bottleneck. Iceberg/Delta ship `rewriteDataFiles` /
`OPTIMIZE` for exactly this; the reference SDK (a per-document LLM
pipeline, `/root/reference/graphrag_sdk/kg.py`) has no storage layout
surface at all — this is engine-new, next to `sinks/bucketed.py` and
`sinks/zorder.py` in the layout family.

Two layers:

- `plan_bins` — the pure, SQL-replayable planning math (the driver gate
  hash-compares it): files in deterministic path order, PRIOR running
  byte sum via the two-phase distributed prefix-sum
  (`sharding._prior_running` — per-partition totals to the driver, one
  row per partition, local windows after a broadcast offset join; no
  global single-partition window), bin = prior_bytes div target. A file
  straddling a boundary joins the EARLIER bin, so bins overshoot by at
  most one file — the same greedy next-fit contract as Iceberg's
  bin-packing rewriter, but expressed as expressions a DuckDB oracle
  replays exactly.
- `compact_parquet` — executes a plan: one distributed job reads every
  input file, joins the broadcast (file -> bin) manifest on
  `input_file_name`, hash-repartitions on the bin id (each bin's rows
  land in exactly ONE task), and writes `partitionBy(bin)` — so each
  bin emits exactly one output file. The manifest is metadata-scale
  (one row per FILE, not per data row); the data plane is a single
  scan + one shuffle keyed on the bin id.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgforge.functions.sharding import _prior_running

_BIN_COL = "__compact_bin"


def plan_bins(
    files: DataFrame,
    target_bytes: int,
    path_col: str = "path",
    bytes_col: str = "bytes",
) -> DataFrame:
    """(path, bytes, bin) greedy next-fit packing plan: files in
    ascending `path_col` order, bin = (prior running bytes) div target.
    Deterministic, partitioning-independent, all-BIGINT."""
    if target_bytes <= 0:
        raise ValueError("plan_bins: target_bytes must be positive")
    run = _prior_running(files, path_col, bytes_col, None)
    return run.select(
        path_col,
        F.col(bytes_col).cast("long").alias(bytes_col),
        F.expr(f"__run div {int(target_bytes)}").cast("long").alias("bin"),
    )


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_bytes: int,
    flatten: bool = True,
) -> DataFrame:
    """Compact every `*.parquet` under `src_dir` (flat dir) into
    ~target-size files under `dst_dir`; returns the executed plan
    (path, bytes, bin). With `flatten=True` outputs are renamed to flat
    `compacted-NNNNN.parquet` files (a driver-side metadata move);
    otherwise the `bin=N/` hive layout is left as written.
    """
    names = sorted(
        e.name
        for e in os.scandir(src_dir)
        if e.is_file() and e.name.endswith(".parquet")
    )
    if not names:
        raise ValueError(f"compact_parquet: no parquet files in {src_dir}")
    manifest = spark.createDataFrame(
        [(n, os.path.getsize(os.path.join(src_dir, n))) for n in names],
        "path string, bytes long",
    )
    plan = plan_bins(manifest, target_bytes).localCheckpoint()
    # data plane: one scan; file -> bin via broadcast manifest join on
    # the input file name (normalized to the base name).
    df = spark.read.parquet(src_dir).withColumn(
        "__file",
        F.element_at(F.split(F.input_file_name(), "/"), -1),
    )
    binned = df.join(
        F.broadcast(plan.select(F.col("path").alias("__file"), "bin")),
        on="__file",
    ).drop("__file")
    n_bins = plan.agg(F.max("bin")).collect()[0][0] + 1
    (
        binned.withColumnRenamed("bin", _BIN_COL)
        .repartition(int(n_bins), F.col(_BIN_COL))
        .write.mode("overwrite")
        .partitionBy(_BIN_COL)
        .parquet(dst_dir)
    )
    if flatten:
        for entry in sorted(os.listdir(dst_dir)):
            if not entry.startswith(f"{_BIN_COL}="):
                continue
            b = int(entry.split("=", 1)[1])
            sub = os.path.join(dst_dir, entry)
            parts = [p for p in os.listdir(sub) if p.endswith(".parquet")]
            assert len(parts) == 1, (entry, parts)
            os.replace(
                os.path.join(sub, parts[0]),
                os.path.join(dst_dir, f"compacted-{b:05d}.parquet"),
            )
            shutil.rmtree(sub)
    return plan
