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
reader keeps its old version; the previous version is pruned only
after the next refresh lands (keep-2 window, the parts-store grace
idea without tombstones because versions are never merged).
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

    def __init__(self, spark: SparkSession, tick_seconds: float = 1.0) -> None:
        self._spark = spark
        self._jobs: dict[str, RefreshJob] = {}
        self._tick = tick_seconds
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
        the next ``v=N`` snapshot, then prune all but the newest two
        versions (the old latest may still be mid-scan in a reader)."""
        job = self._jobs[name]
        vs = _versions(job.path)
        nxt = (vs[-1][0] + 1) if vs else 1
        job.build(self._spark).write.mode("overwrite").parquet(
            f"{job.path}/v={nxt}"
        )
        for _, d in _versions(job.path)[:-2]:
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
