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
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STAGE_COMPLETE = "stage_complete"
PARTITION = "partition"


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
        per_part = (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .count()
            .collect()
        )
        now = time.time()
        rows = [
            (self.run_id, name, int(r["partition_id"]), int(r["count"]),
             wall_ms, PARTITION, now)
            for r in per_part
        ]
        total = sum(r["count"] for r in per_part)
        rows.append(
            (self.run_id, name, -1, int(total), wall_ms, STAGE_COMPLETE, now)
        )
        self._append_lineage(rows)

        if os.environ.get("KGFORGE_FAIL_AFTER_STAGE") == name:
            raise RuntimeError(f"injected failure after stage '{name}'")
        return out

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
