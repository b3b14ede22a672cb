"""Per-stage / per-partition lineage + checkpoint-resume (SURVEY §2.9, M5).

The reference's incrementality is a driver-resident ``self.sources`` set that
is lost on restart (/root/reference/graphrag_sdk/kg.py:58,104-106) plus one
log file per task (steps/extract_data_step.py:56-57,104-115). The engine
replaces both with a durable lineage table:

    lineage(run_id, stage, partition_id, rows, wall_ms, status, finished_at)

Each pipeline stage writes its output as parquet (Iceberg-shaped layout: one
directory per stage, partition column preserved) and then appends lineage
rows — one per output partition (counters) plus one ``stage_complete``
summary row. A restarted run consults lineage + the stage output marker and
*skips* every completed stage, re-reading its output instead of recomputing —
the anti-join-on-completed-work semantics required by the north rule.

Failure injection for tests: set env ``KGFORGE_FAIL_AFTER_STAGE=<name>`` and
the driver raises immediately after that stage commits, simulating a mid-run
crash between stages.
"""

from __future__ import annotations

import os
import re
import time
import uuid
from dataclasses import dataclass, field

from pyspark.errors.exceptions.captured import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STAGE_COMPLETE = "stage_complete"
# Per-partition counter rows carry WHICH counting mode produced them
# (ADVICE r03: the footer path keys on the writer's file part index, the
# scan fallback on spark_partition_id of the re-read — different
# numberings, so rows from the two modes must not be compared as if
# interchangeable; totals agree either way). `PARTITION` stays the shared
# prefix for filters that only need "any per-partition row".
PARTITION = "partition"
PARTITION_FOOTER = "partition_footer"
PARTITION_SCAN = "partition_scan"


def _footer_counts(path: str) -> dict[str, int] | None:
    """Per-file row counts from parquet FOOTER metadata — no data scan.

    The write already produced the files; their footers carry exact row
    counts, so lineage counters cost one tiny metadata read per file
    instead of a second full pass over the stage output (VERDICT r02 #3:
    harmless at sf0.1, a real tax at 100 TB). Returns None when footers
    are unreachable (object store without a local mount, torn file) so the
    caller can fall back to the scan; a cluster deployment would swap this
    for the write's task metrics via a QueryExecutionListener, same idea.
    """
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover - pyarrow is baked in here
        return None
    counts: dict[str, int] = {}
    try:
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet") and not f.startswith("."):
                    p = os.path.join(root, f)
                    counts[p] = pq.ParquetFile(p).metadata.num_rows
    except Exception:
        return None
    return counts


def _part_index(file_path: str) -> int:
    """part-00012-<uuid>... -> 12 (the writer task's partition index)."""
    name = os.path.basename(file_path)
    try:
        return int(name.split("-")[1])
    except (IndexError, ValueError):
        return -1


@dataclass
class RunContext:
    spark: SparkSession
    out_dir: str
    run_id: str = field(default_factory=lambda: uuid.uuid4().hex[:12])

    @property
    def lineage_dir(self) -> str:
        return os.path.join(self.out_dir, "_lineage")

    # ---------------------------------------------------------------- io
    def stage_path(self, name: str) -> str:
        return os.path.join(self.out_dir, name)

    def _lineage_df(self) -> DataFrame | None:
        path = self.lineage_dir
        if not os.path.isdir(path):
            return None
        try:
            return self.spark.read.parquet(path)
        except Exception:
            return None

    def lineage(self) -> DataFrame | None:
        return self._lineage_df()

    def stage_complete(self, name: str) -> bool:
        if not os.path.exists(os.path.join(self.stage_path(name), "_SUCCESS")):
            return False
        lin = self._lineage_df()
        if lin is None:
            return False
        n = (
            lin.filter(
                (F.col("stage") == name) & (F.col("status") == STAGE_COMPLETE)
            )
            .limit(1)
            .count()
        )
        return n > 0

    def _append_lineage(self, rows: list[tuple]) -> None:
        df = self.spark.createDataFrame(
            rows,
            "run_id string, stage string, partition_id int, rows long, "
            "wall_ms long, status string, finished_at double",
        )
        df.coalesce(1).write.mode("append").parquet(self.lineage_dir)

    # ---------------------------------------------------------------- api
    def run_stage(
        self,
        name: str,
        build: "callable",
        repartition_col: str | None = None,
        num_partitions: int | None = None,
    ) -> DataFrame:
        """Compute-or-reuse one stage.

        `build()` -> DataFrame is only invoked when the stage is incomplete.
        Output layout: parquet under ``out_dir/<name>``; when
        `repartition_col` is set the data is hash-repartitioned on it first
        (url_host bucketing analogue for the local run).
        """
        path = self.stage_path(name)
        if self.stage_complete(name):
            return self.spark.read.parquet(path)

        t0 = time.monotonic()
        df = build()
        if repartition_col is not None:
            n = num_partitions or self.spark.sparkContext.defaultParallelism
            df = df.repartition(n, F.col(repartition_col))
        df.write.mode("overwrite").parquet(path)
        wall_ms = int((time.monotonic() - t0) * 1000)

        out = self.spark.read.parquet(path)
        footer = _footer_counts(path)
        if footer is not None:
            mode = PARTITION_FOOTER
            per_part: dict[int, int] = {}
            for p, c in footer.items():
                idx = _part_index(p)
                per_part[idx] = per_part.get(idx, 0) + c
        else:  # metadata unreachable -> the old one-pass scan
            mode = PARTITION_SCAN
            per_part = {
                int(r["partition_id"]): int(r["count"])
                for r in out.groupBy(
                    F.spark_partition_id().alias("partition_id")
                )
                .count()
                .collect()
            }
        now = time.time()
        rows = [
            (self.run_id, name, pid, c, wall_ms, mode, now)
            for pid, c in sorted(per_part.items())
        ]
        total = sum(per_part.values())
        rows.append(
            (self.run_id, name, -1, int(total), wall_ms, STAGE_COMPLETE, now)
        )
        self._append_lineage(rows)

        if os.environ.get("KGFORGE_FAIL_AFTER_STAGE") == name:
            raise RuntimeError(f"injected failure after stage '{name}'")
        return out

    def run_stage_bucketed(
        self,
        name: str,
        input_df: DataFrame,
        transform: "callable",
        bucket_col: str = "url",
        n_buckets: int = 64,
    ) -> DataFrame:
        """Compute-or-resume one stage at BUCKET granularity.

        The input is hashed into `n_buckets` buckets on `bucket_col`;
        `transform(df)` must preserve that column. Completed buckets are
        recorded in lineage (`status='bucket_complete'`) and skipped on
        restart — the anti-join-on-completed-work semantics at sub-stage
        granularity, so a crash mid-stage only recomputes the buckets whose
        lineage never committed. Partially-written buckets are safe:
        dynamic partition overwrite replaces exactly the re-run buckets.
        """
        path = self.stage_path(name)
        bucket = F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets))
        # dynamic partition overwrite emits no root _SUCCESS marker; the
        # lineage stage_complete row alone is the commit record here
        lin0 = self._lineage_df()
        if lin0 is not None and not lin0.filter(
            (F.col("stage") == name) & (F.col("status") == STAGE_COMPLETE)
        ).isEmpty():
            return self.spark.read.parquet(path).drop("bucket")

        lin = self._lineage_df()
        done: set[int] = set()
        if lin is not None:
            done = {
                r["partition_id"]
                for r in lin.filter(
                    (F.col("stage") == name)
                    & (F.col("status") == "bucket_complete")
                ).select("partition_id").collect()
            }
        todo = input_df.withColumn("bucket", bucket)
        if done:
            todo = todo.filter(~F.col("bucket").isin(*[int(b) for b in done]))

        t0 = time.monotonic()
        n_new = 0
        if not todo.isEmpty():
            out = transform(todo.drop("bucket")).withColumn("bucket", bucket)
            (
                out.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket")
                .parquet(path)
            )
            wall_ms = int((time.monotonic() - t0) * 1000)
            try:
                written = self.spark.read.parquet(path)
            except AnalysisException:
                # a dynamic-partitioned write of an EMPTY stage output
                # leaves no readable footer (unlike plain writes,
                # SPARK-23271): write the empty schema plainly so
                # downstream reads see an empty-but-typed stage. Checked
                # here rather than pre-checking out.isEmpty(), which would
                # cost a partial evaluation of the transform on every
                # non-empty stage too.
                out.limit(0).write.mode("overwrite").parquet(path)
                written = self.spark.read.parquet(path)
            footer = _footer_counts(path)
            if footer is not None:  # counts from footers, not a re-scan
                agg: dict[int, int] = {}
                for p, c in footer.items():
                    m = re.search(r"bucket=(\d+)", p)
                    if m:
                        b = int(m.group(1))
                        agg[b] = agg.get(b, 0) + c
                per_bucket = {b: c for b, c in agg.items() if b not in done}
            else:
                per_bucket = {
                    int(r["bucket"]): int(r["count"])
                    for r in written.groupBy("bucket").count().collect()
                    if int(r["bucket"]) not in done
                }
            now = time.time()
            rows = [
                (self.run_id, name, b, c, wall_ms, "bucket_complete", now)
                for b, c in sorted(per_bucket.items())
            ]
            n_new = sum(per_bucket.values())
            if rows:
                self._append_lineage(rows)

        final = self.spark.read.parquet(path)
        footer_all = _footer_counts(path)
        total = (
            sum(footer_all.values()) if footer_all is not None
            else final.count()
        )
        self._append_lineage(
            [
                (
                    self.run_id, name, -1, int(total),
                    int((time.monotonic() - t0) * 1000),
                    STAGE_COMPLETE, time.time(),
                )
            ]
        )
        if os.environ.get("KGFORGE_FAIL_AFTER_STAGE") == name:
            raise RuntimeError(f"injected failure after stage '{name}'")
        # the _SUCCESS marker from the last write plus the stage_complete row
        # make subsequent runs short-circuit entirely
        return final.drop("bucket")

    def stage_buckets(self, name: str) -> dict[int, str]:
        """bucket -> run_id that completed it (resume-evidence helper)."""
        lin = self._lineage_df()
        if lin is None:
            return {}
        return {
            int(r["partition_id"]): r["run_id"]
            for r in lin.filter(
                (F.col("stage") == name)
                & (F.col("status") == "bucket_complete")
            ).select("partition_id", "run_id").collect()
        }

    def stage_runs(self, name: str) -> list[str]:
        """run_ids that produced a stage_complete record for `name`."""
        lin = self._lineage_df()
        if lin is None:
            return []
        return [
            r["run_id"]
            for r in lin.filter(
                (F.col("stage") == name) & (F.col("status") == STAGE_COMPLETE)
            )
            .select("run_id")
            .collect()
        ]
