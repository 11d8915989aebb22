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


def test_keep_versions_configurable(spark, tmp_path):
    # ADVICE r9: widen the retention window for slow readers
    path = str(tmp_path / "mv")
    sched = RefreshScheduler(spark, keep_versions=4)
    sched.register("job", _build(7), interval_seconds=9999, path=path)
    for _ in range(6):
        sched.refresh_now("job")
    versions = sorted(p.name for p in Path(path).glob("v=*"))
    assert versions == ["v=3", "v=4", "v=5", "v=6"]


def test_collect_snapshot_info_and_retry(spark, tmp_path):
    from clickhouse_realtime_analytics_demo_spark.streaming.refresh import (
        collect_snapshot,
        snapshot_info,
    )

    path = str(tmp_path / "mv")
    assert snapshot_info(path) is None and collect_snapshot(spark, path) is None
    sched = RefreshScheduler(spark)
    sched.register("job", _build(1), interval_seconds=9999, path=path)
    sched.refresh_now("job")
    rows, info = collect_snapshot(spark, path)
    assert len(rows) == 10 and info["version"] == 1
    assert time.time() - info["refreshed_at"] < 300

    # a reader slower than the keep-window: its version is pruned
    # between resolve and read -> collect_snapshot re-resolves and
    # serves the newer snapshot instead of failing (ADVICE r9).
    # Simulated by making the FIRST resolve return an already-deleted
    # version, exactly the race the retry exists for.
    sched._jobs["job"].build = _build(2)
    sched.refresh_now("job")  # v=2 lands; pretend v=99 was resolved then pruned
    from clickhouse_realtime_analytics_demo_spark.streaming import refresh as refresh_mod

    real_info = refresh_mod.snapshot_info
    calls = {"n": 0}

    def stale_then_real(p):
        calls["n"] += 1
        if calls["n"] == 1:
            return {"version": 99, "refreshed_at": 0.0}  # pruned mid-read
        return real_info(p)

    refresh_mod.snapshot_info = stale_then_real
    try:
        rows, info = refresh_mod.collect_snapshot(spark, path)
    finally:
        refresh_mod.snapshot_info = real_info
    assert calls["n"] == 2  # the retry fired
    assert info["version"] == 2 and {r["snapshot_tag"] for r in rows} == {2}
