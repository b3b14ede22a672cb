"""Crawl-frontier scheduling (sources/frontier.py): politeness
invariants — host affinity, exact per-host spacing, phase bounds,
per-host budget, determinism, worker-queue layout."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from kgforge.sources.frontier import schedule_frontier, worker_queues


def _frontier(spark):
    rows = []
    for h, n in [("a.com", 5), ("b.org", 3), ("c.net", 1)]:
        rows += [(f"https://{h}/p{i}", h) for i in range(n)]
    return spark.createDataFrame(rows, "url string, host string")


def test_schedule_politeness_invariants(spark):
    out = schedule_frontier(_frontier(spark), n_workers=3, delay_s=10)
    rows = out.collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r)
    for h, rs in by_host.items():
        rs.sort(key=lambda r: r.slot)
        # one worker per host
        assert len({r.worker for r in rs}) == 1
        # slots 0..n-1, spacing exactly delay
        assert [r.slot for r in rs] == list(range(len(rs)))
        offs = [r.fetch_offset_s for r in rs]
        assert all(b - a == 10 for a, b in zip(offs, offs[1:]))
        # phase within [0, delay)
        assert 0 <= offs[0] < 10
    # hash matches the driver-side replay used by the oracle
    for h, rs in by_host.items():
        hv = int(
            hashlib.md5(f"fr|{h}".encode()).hexdigest()[:12], 16
        )
        assert rs[0].worker == hv % 3
        assert rs[0].fetch_offset_s == hv % 10


def test_schedule_max_per_host_budget(spark):
    out = schedule_frontier(
        _frontier(spark), n_workers=2, delay_s=5, max_per_host=2
    )
    counts = {
        r.host: r["count"]
        for r in out.groupBy("host").count().collect()
    }
    assert counts == {"a.com": 2, "b.org": 2, "c.net": 1}


def test_schedule_validates_params(spark):
    with pytest.raises(ValueError):
        schedule_frontier(_frontier(spark), n_workers=0, delay_s=5)
    with pytest.raises(ValueError):
        schedule_frontier(_frontier(spark), n_workers=2, delay_s=0)


def test_worker_queues_layout(spark):
    sched = schedule_frontier(_frontier(spark), n_workers=4, delay_s=7)
    q = worker_queues(sched, 4)
    assert q.rdd.getNumPartitions() == 4
    # within each partition, offsets are non-decreasing
    def check(it):
        last = -1
        for row in it:
            assert row.fetch_offset_s >= last
            last = row.fetch_offset_s
        return iter([True])

    assert all(q.rdd.mapPartitions(lambda it: check(it)).collect())
