"""Rate-controlled ingest loop: parts land per tick, ids stay
monotonic across ticks, downstream readers see fresh rows, and the
measured rate is reported honestly."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.streaming.ingest import IngestLoop
from clickhouse_realtime_analytics_demo_spark.sources import writer


def test_ingest_loop_rate_and_monotonic_ids(spark, tmp_path):
    # on a cold JVM the first writes pay codegen/JIT warmup (~10 s);
    # absorb it in a scratch dir so the measured run isn't dominated
    IngestLoop(
        spark, str(tmp_path / "warmup"), events_per_tick=50, orders_per_tick=10
    )._tick(0)
    loop = IngestLoop(
        spark, str(tmp_path / "lake"), events_per_tick=50, orders_per_tick=10,
        tick_seconds=0.2,
    )
    stats = loop.run(seconds=10.0)
    assert stats.ticks >= 3
    assert stats.events_rows == stats.ticks * 50
    assert stats.orders_rows == stats.ticks * 10

    back = writer.read_table(spark, str(tmp_path / "lake"), "events")
    assert back.count() == stats.events_rows
    ids = back.agg(F.min("event_id"), F.max("event_id"), F.count_distinct("event_id")).collect()[0]
    # monotonic, dense, no overlap between tick batches
    assert ids[0] == 1 and ids[2] == stats.events_rows

    orders = writer.read_table(spark, str(tmp_path / "lake"), "orders")
    assert orders.count() == stats.orders_rows
    assert stats.events_per_s > 0 and stats.elapsed_s >= 10.0


def test_ingest_visible_to_change_tail(spark, tmp_path):
    from clickhouse_realtime_analytics_demo_spark.streaming import tail

    loop = IngestLoop(spark, str(tmp_path), events_per_tick=20, orders_per_tick=0,
                      tick_seconds=0.1)
    loop.run(seconds=1.0)
    events = writer.read_table(spark, str(tmp_path), "events")
    rows = tail.poll(events, last_event_id=0, limit=10).collect()
    assert [r.event_id for r in rows] == list(range(1, 11))
    rows2 = tail.poll(events, last_event_id=10, limit=10).collect()
    assert rows2 and min(r.event_id for r in rows2) == 11


def test_ingest_headroom_2x_reference_rate(spark, tmp_path):
    """BASELINE.md's one directly comparable metric is ingest:
    100 events/s + 20 orders/s sustained (ARCHITECTURE.md:85-89).
    Run at 2x that rate (200 ev/s + 40 ord/s, 1 s ticks) and require
    the rate to be SUSTAINED: measured events/s >= 95% of target over
    the whole run. The loop's fixed-rate schedule catches up after a
    slow tick (no work skipped), so sustained throughput is the hard
    gate; individual tick latency gets an EXPLICIT overrun budget
    (25% of ticks) because in local mode a 240-row tick is bound by
    fixed per-job driver cost (~0.3-0.7 s) whose JIT/GC jitter can
    exceed 1 s on a shared box — measured in ingest.py's docstring,
    recorded per-tick in stats.tick_latencies."""
    # throwaway ticks in a scratch dir absorb JVM/codegen/JIT warmup,
    # as the reference's first HTTP batches absorb connection setup
    # (probe data: C2 compilation keeps lowering tick latency for the
    # first ~4-6 ticks, not just the first)
    warm = IngestLoop(
        spark, str(tmp_path / "warmup"), events_per_tick=200, orders_per_tick=40
    )
    for i in range(3):
        warm._tick(i)
    loop = IngestLoop(
        spark, str(tmp_path / "lake"), events_per_tick=200, orders_per_tick=40,
        tick_seconds=1.0,
    )
    # 16 s (was 8): long enough that a single slow tick landing at the
    # END of the window — which fixed-rate pacing cannot catch up
    # before run() exits — amortizes below the 95% sustained gate
    # instead of flaking it (r5 ADVICE): 3200/(16+0.4) = 195 >= 190.
    stats = loop.run(seconds=16.0)
    lat = ", ".join(f"{s:.2f}" for s in stats.tick_latencies)
    assert stats.ticks >= 15, f"only {stats.ticks} ticks; latencies: {lat}"
    # hard gate: sustained 2x throughput over the full run
    assert stats.events_per_s >= 190.0, (
        f"sustained rate {stats.events_per_s:.0f} ev/s < 190; latencies: {lat}"
    )
    assert stats.orders_per_s >= 38.0
    # explicit per-tick latency budget (documented above, not silent)
    assert stats.overruns <= stats.ticks // 4, (
        f"{stats.overruns}/{stats.ticks} ticks over 1 s; latencies: {lat}"
    )
    assert stats.events_rows == stats.ticks * 200
    assert stats.orders_rows == stats.ticks * 40
