"""Crawl-frontier scheduling: host-partitioned politeness planning.

The web-scale ingest problem upstream of `sources/loaders.py::load_url`
and `sources/robots.py`: a frontier of billions of URLs must be fetched
WITHOUT hammering any host — every production crawler (Mercator,
Heritrix, Nutch, CC's own) solves it the same way: (1) partition the
frontier BY HOST so exactly one worker owns a host (politeness becomes
a per-worker local guarantee — no cross-worker coordination), (2)
serialize each host's queue with a crawl delay, (3) phase-stagger hosts
so fetch waves don't synchronize. All three are integer/hash
expressions here — no RNG, no Python — so the schedule is a pure
function of the frontier and a DuckDB oracle replays it row-for-row
(the `random_walks`/`stratified_sample` md5-draw discipline; hashes use
the same first-12-hex-chars integerization as `functions/sketch.py`).

Scale shape: ONE window (row_number per host, URL order) over a shuffle
keyed on the host — the same key the output is consumed by, so a
downstream per-worker writer repartitions for free. Host skew (a
million-URL host) is inherent to the SEMANTICS (its queue really is
that long) and bounded by `max_per_host`, which truncates each queue
deterministically — the knob real crawlers call a per-host budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HEX = 12  # 48 uniform bits, same draw width as functions/sketch.py


def _host_hash(host) -> "F.Column":
    h = F.md5(F.encode(F.concat(F.lit("fr|"), host), "UTF-8"))
    return F.conv(F.substring(h, 1, _HEX), 16, 10).cast("long")


def schedule_frontier(
    df: DataFrame,
    n_workers: int,
    delay_s: int,
    url_col: str = "url",
    host_col: str = "host",
    max_per_host: int | None = None,
) -> DataFrame:
    """(url, host, worker, slot, fetch_offset_s): worker =
    md5-hash(host) mod n_workers (host affinity), slot = the URL's
    0-based position in its host's URL-ordered queue, fetch_offset_s =
    host_phase + slot * delay_s where host_phase = hash mod delay_s
    (de-synchronizes hosts without changing per-host spacing).
    `max_per_host` truncates each host queue (per-host budget)."""
    if n_workers <= 0 or delay_s <= 0:
        raise ValueError(
            "schedule_frontier: n_workers and delay_s must be positive"
        )
    w = Window.partitionBy(host_col).orderBy(url_col)
    hh = _host_hash(F.col(host_col))
    out = df.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        (hh % n_workers).cast("long").alias("worker"),
        (F.row_number().over(w) - 1).cast("long").alias("slot"),
        (hh % delay_s).cast("long").alias("__phase"),
    )
    if max_per_host is not None:
        out = out.filter(F.col("slot") < max_per_host)
    return out.select(
        "url",
        "host",
        "worker",
        "slot",
        (F.col("__phase") + F.col("slot") * delay_s)
        .cast("long")
        .alias("fetch_offset_s"),
    )


def worker_queues(schedule: DataFrame, n_workers: int) -> DataFrame:
    """Repartition a schedule into per-worker fetch order — `n_workers`
    partitions, rows sorted by (fetch_offset_s, host, url) within each,
    ready for a foreachPartition fetcher. Host affinity (one worker per
    host) is already in the `worker` column, so this is one shuffle on
    the integer worker id."""
    return schedule.repartition(n_workers, "worker").sortWithinPartitions(
        "fetch_offset_s", "host", "url"
    )
