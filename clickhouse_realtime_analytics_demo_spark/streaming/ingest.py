"""Rate-controlled continuous ingest (SURVEY §2.9 ST1/ST11; reference
stream_data_realtime.py:23-26,293-334 — 100 events/s + 20 orders/s in
1 s batches against BASELINE.md's ingest-throughput row).

Each tick writes one seeded generator batch as an immutable sorted
parquet part via the lake writer — the analog of one HTTP INSERT block
becoming one MergeTree part. Downstream consumers are the streaming
layer's file sources (incremental MVs, EventTail), which pick parts up
on their next trigger — the same ingest → MV → query freshness loop as
the reference (§3.2).

``run()`` is deliberately a plain thread loop, not a Structured
Streaming query: the *source* side of the demo is an external producer
in the reference too.

Pacing is a fixed-rate schedule (absolute deadlines from t0), not
per-tick relative sleeps: a tick that runs long borrows from the next
sleeps until the schedule is caught up, so sustained throughput stays
at the target as long as the *average* tick latency is below
``tick_seconds``. No work is ever skipped — ``overruns`` counts ticks
whose own latency exceeded ``tick_seconds`` (per-tick deadline
misses), and ``tick_latencies`` records every tick for diagnosis, so
measured throughput is honest.

In local mode each tick pays a fixed driver cost (~0.3-0.7 s per
Spark job on this class of box: plan analysis + scheduling + commit)
that row count barely moves, so at high rates the right lever is
batching more rows per tick, not shrinking the tick — the same
adaptation any ingester makes when per-batch overhead dominates.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from clickhouse_realtime_analytics_demo_spark.sources import generator, writer


@dataclass
class IngestStats:
    ticks: int = 0
    events_rows: int = 0
    orders_rows: int = 0
    overruns: int = 0
    elapsed_s: float = 0.0
    tick_latencies: list[float] = field(default_factory=list)
    # (perf_counter at tick completion, cumulative events, cumulative
    # orders) — the write-side cursor trail a freshness probe compares
    # against read-side visibility (mixed_load_probe.py)
    tick_marks: list[tuple[float, int, int]] = field(default_factory=list)

    @property
    def events_per_s(self) -> float:
        return self.events_rows / self.elapsed_s if self.elapsed_s else 0.0

    @property
    def orders_per_s(self) -> float:
        return self.orders_rows / self.elapsed_s if self.elapsed_s else 0.0


@dataclass
class IngestLoop:
    """Continuous generator → parquet-part ingest at a target rate."""

    spark: SparkSession
    out_dir: str
    events_per_tick: int = 100
    orders_per_tick: int = 20
    tick_seconds: float = 1.0
    n_users: int = 1000
    # FAIR-scheduler pool for the per-tick write jobs: under mixed
    # load (dashboards + MV maintenance on the same cluster) a named
    # pool keeps ingest ticks from queueing behind full-scan queries
    # (session.py sets spark.scheduler.mode=FAIR; pools are created on
    # first use). None = default pool. Set on each writer THREAD —
    # local properties don't inherit across Python threads.
    scheduler_pool: str | None = None
    stats: IngestStats = field(default_factory=IngestStats)
    _stop: threading.Event = field(default_factory=threading.Event, repr=False)
    _thread: threading.Thread | None = field(default=None, repr=False)

    def _tick(self, seq: int) -> None:
        # events + orders submitted as concurrent Spark jobs (the
        # reference uses 4 parallel insert threads for the same
        # reason, stream_data_realtime.py:52-53): per-job driver
        # latency, not data volume, bounds the tick rate.
        def write_events() -> None:
            if self.scheduler_pool:
                self.spark.sparkContext.setLocalProperty(
                    "spark.scheduler.pool", self.scheduler_pool
                )
            ev = generator.events(
                self.spark,
                n=self.events_per_tick,
                n_users=self.n_users,
                seed=1000 + seq,  # per-tick seed: deterministic, non-repeating
                partitions=1,  # one part per tick, like one INSERT block
                id_offset=seq * self.events_per_tick,
            )
            writer.write_table(ev, self.out_dir, "events", mode="append")

        def write_orders() -> None:
            if self.scheduler_pool:
                self.spark.sparkContext.setLocalProperty(
                    "spark.scheduler.pool", self.scheduler_pool
                )
            orders = generator.orders(
                self.spark,
                n=self.orders_per_tick,
                n_users=self.n_users,
                seed=2000 + seq,
                partitions=1,
                id_offset=seq * self.orders_per_tick,
            )
            writer.write_table(orders, self.out_dir, "orders", mode="append")

        jobs = [threading.Thread(target=write_events)]
        if self.orders_per_tick:
            jobs.append(threading.Thread(target=write_orders))
        for j in jobs:
            j.start()
        for j in jobs:
            j.join()
        self.stats.events_rows += self.events_per_tick
        if self.orders_per_tick:
            self.stats.orders_rows += self.orders_per_tick
        self.stats.ticks += 1
        self.stats.tick_marks.append(
            (time.perf_counter(), self.stats.events_rows, self.stats.orders_rows)
        )

    def run(self, seconds: float) -> IngestStats:
        """Blocking run for ``seconds``; returns measured stats."""
        t0 = time.perf_counter()
        deadline = t0  # fixed-rate schedule: t0 + k * tick_seconds
        seq = 0
        while time.perf_counter() - t0 < seconds and not self._stop.is_set():
            deadline += self.tick_seconds
            tick_start = time.perf_counter()
            self._tick(seq)
            seq += 1
            now = time.perf_counter()
            spent = now - tick_start
            self.stats.tick_latencies.append(spent)
            if spent >= self.tick_seconds:
                self.stats.overruns += 1
            # catch-up pacing: schedule debt shrinks future sleeps (down
            # to zero) instead of being forgiven — sustained rate holds
            # whenever average tick latency < tick_seconds
            if now < deadline:
                self._stop.wait(deadline - now)
        self.stats.elapsed_s = time.perf_counter() - t0
        return self.stats

    def start(self, seconds: float) -> None:
        self._thread = threading.Thread(target=self.run, args=(seconds,), daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join()
