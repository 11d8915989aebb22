"""Refreshable (scheduled) materialized views (SURVEY §2.9 ST10).

The reference's 5 refreshable MVs recompute on timers — 1 h top
products, 6 h CLV/RFM, 12 h cohort retention, 1 d market basket +
daily KPI (05-add-refreshable-mvs.sql.disabled:18,56,108,156,199).

Spark analog: a scheduler thread that runs a batch job per MV on its
cadence and swaps in a full snapshot — the ReplacingMergeTree
keep-latest upsert (05:200) degenerates to a snapshot refresh.

Reader safety (r9): a plain ``mode("overwrite")`` deletes files under
a concurrent reader mid-scan, so each refresh writes a NEW versioned
directory ``{path}/v=N`` and readers (:func:`read_snapshot`) pick the
highest version carrying Spark's ``_SUCCESS`` marker — an in-flight
reader keeps its old version; old versions are pruned only after the
next refresh lands (keep-``N`` window, configurable, default 2 — the
parts-store grace idea without tombstones because versions are never
merged).

r10 (ADVICE r9): the keep-2 window only protects readers at most one
refresh behind; a poll slower than 2× the cadence (or a long
analytical scan) could still lose files mid-scan. Two valves:
``keep_versions=N`` widens the retention window, and
:func:`collect_snapshot` retries once on a file-not-found by
re-resolving the latest version — the serving-path readers (the REST
funnel route, the mixed-load poller) go through it.
"""

from __future__ import annotations

import shutil
import threading
import time
from collections.abc import Callable
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def _versions(path: str) -> list[tuple[int, Path]]:
    root = Path(path)
    if not root.exists():
        return []
    out = []
    for d in root.glob("v=*"):
        if (d / "_SUCCESS").exists():
            try:
                out.append((int(d.name[2:]), d))
            except ValueError:
                continue
    return sorted(out)


def read_snapshot(spark: SparkSession, path: str) -> DataFrame | None:
    """Latest complete refresh of a job, or None before the first one."""
    vs = _versions(path)
    if not vs:
        return None
    return spark.read.parquet(str(vs[-1][1]))


def snapshot_info(path: str) -> dict | None:
    """Metadata of the latest complete snapshot: version number and the
    refresh completion time (the ``_SUCCESS`` marker's mtime — written
    last by Spark's commit protocol, so it IS the moment the snapshot
    became readable). None before the first refresh."""
    vs = _versions(path)
    if not vs:
        return None
    v, d = vs[-1]
    return {"version": v, "refreshed_at": (d / "_SUCCESS").stat().st_mtime}


def collect_snapshot(spark: SparkSession, path: str) -> tuple[list, dict] | None:
    """Collect the latest snapshot's rows with its metadata, retrying
    once if the version is pruned mid-read (a reader further behind
    than the keep-window; ADVICE r9) by re-resolving the new latest.
    Returns (rows, info) or None before the first refresh."""
    for attempt in (0, 1):
        info = snapshot_info(path)
        if info is None:
            return None
        try:
            rows = spark.read.parquet(f"{path}/v={info['version']}").collect()
            return rows, info
        except Exception as exc:  # noqa: BLE001 — Py4J wraps the FNF
            # str(), not repr(): pyspark's captured exceptions repr as
            # bare `AnalysisException()` with the message only in str
            msg = f"{type(exc).__name__}: {exc}"
            pruned = "FileNotFound" in msg or "PATH_NOT_FOUND" in msg
            if attempt == 1 or not pruned:
                raise
    return None  # unreachable; keeps type-checkers honest


@dataclass
class RefreshJob:
    name: str
    build: Callable[[SparkSession], DataFrame]
    interval_seconds: float
    path: str
    last_run: float = 0.0
    runs: int = 0


class RefreshScheduler:
    """Runs registered snapshot jobs on their cadence until stopped."""

    def __init__(
        self,
        spark: SparkSession,
        tick_seconds: float = 1.0,
        keep_versions: int = 2,
    ) -> None:
        self._spark = spark
        self._jobs: dict[str, RefreshJob] = {}
        self._tick = tick_seconds
        # retention window: readers up to keep_versions-1 refreshes
        # stale never lose files mid-scan (ADVICE r9); slower readers
        # fall back to collect_snapshot's re-resolve retry
        self._keep = max(2, keep_versions)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def register(
        self,
        name: str,
        build: Callable[[SparkSession], DataFrame],
        interval_seconds: float,
        path: str,
    ) -> None:
        self._jobs[name] = RefreshJob(name, build, interval_seconds, path)

    def refresh_now(self, name: str) -> None:
        """Force one refresh (also used by the scheduler loop): write
        the next ``v=N`` snapshot, then prune all but the newest
        ``keep_versions`` (older ones may still be mid-scan in a
        reader)."""
        job = self._jobs[name]
        vs = _versions(job.path)
        nxt = (vs[-1][0] + 1) if vs else 1
        job.build(self._spark).write.mode("overwrite").parquet(
            f"{job.path}/v={nxt}"
        )
        for _, d in _versions(job.path)[: -self._keep]:
            shutil.rmtree(d, ignore_errors=True)
        job.last_run = time.monotonic()
        job.runs += 1

    def _loop(self) -> None:
        while not self._stop.is_set():
            now = time.monotonic()
            for job in self._jobs.values():
                if now - job.last_run >= job.interval_seconds:
                    try:
                        self.refresh_now(job.name)
                    except Exception:  # noqa: BLE001 — keep other jobs alive
                        pass
            self._stop.wait(self._tick)

    def start(self) -> None:
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=10)
