"""Refreshable-MV scheduler (SURVEY §2.9 ST10) — the scheduler itself,
not just the analytics queries it runs: versioned snapshot swap, reader
safety under concurrent refresh, cadence, keep-2 pruning. (r9: the
component previously had only query-level coverage.)"""

from __future__ import annotations

import time
from pathlib import Path

from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.streaming.refresh import (
    RefreshScheduler,
    read_snapshot,
)


def _build(value):
    def build(spark):
        return spark.range(0, 10).select(
            "id", F.lit(value).alias("snapshot_tag")
        )

    return build


def test_refresh_now_versions_and_reader(spark, tmp_path):
    path = str(tmp_path / "mv_funnel")
    sched = RefreshScheduler(spark)
    sched.register("funnel", _build(1), interval_seconds=9999, path=path)
    assert read_snapshot(spark, path) is None  # before the first refresh
    sched.refresh_now("funnel")
    snap = read_snapshot(spark, path)
    assert snap.count() == 10
    assert snap.select("snapshot_tag").distinct().collect()[0][0] == 1


def test_reader_survives_concurrent_refresh(spark, tmp_path):
    # the r9 reader-safety contract: a reader holding v=N keeps working
    # while v=N+1 lands; the NEXT read sees the new version
    path = str(tmp_path / "mv")
    sched = RefreshScheduler(spark)
    sched.register("job", _build(1), interval_seconds=9999, path=path)
    sched.refresh_now("job")
    old = read_snapshot(spark, path)  # plan pinned to v=1
    sched._jobs["job"].build = _build(2)
    sched.refresh_now("job")  # writes v=2; v=1 must survive (keep-2)
    assert old.count() == 10  # old plan still scans its files
    assert read_snapshot(spark, path).select("snapshot_tag").first()[0] == 2


def test_keep_two_pruning(spark, tmp_path):
    path = str(tmp_path / "mv")
    sched = RefreshScheduler(spark)
    sched.register("job", _build(7), interval_seconds=9999, path=path)
    for _ in range(5):
        sched.refresh_now("job")
    versions = sorted(p.name for p in Path(path).glob("v=*"))
    assert versions == ["v=4", "v=5"]


def test_scheduler_loop_cadence(spark, tmp_path):
    path = str(tmp_path / "mv")
    sched = RefreshScheduler(spark, tick_seconds=0.1)
    sched.register("job", _build(3), interval_seconds=0.5, path=path)
    sched.start()
    try:
        deadline = time.monotonic() + 15
        while sched._jobs["job"].runs < 2 and time.monotonic() < deadline:
            time.sleep(0.1)
    finally:
        sched.stop()
    assert sched._jobs["job"].runs >= 2
    assert read_snapshot(spark, path).count() == 10
