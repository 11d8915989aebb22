"""Rate-controlled ingest loop: parts land per tick, ids stay
monotonic across ticks, downstream readers see fresh rows, and the
measured rate is reported honestly."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.streaming.ingest import IngestLoop
from clickhouse_realtime_analytics_demo_spark.sources import writer


def test_ingest_loop_rate_and_monotonic_ids(spark, tmp_path):
    loop = IngestLoop(
        spark, str(tmp_path), events_per_tick=50, orders_per_tick=10, tick_seconds=0.2
    )
    # first tick pays JVM/codegen warmup (~seconds); budget for it
    stats = loop.run(seconds=10.0)
    assert stats.ticks >= 3
    assert stats.events_rows == stats.ticks * 50
    assert stats.orders_rows == stats.ticks * 10

    back = writer.read_table(spark, str(tmp_path), "events")
    assert back.count() == stats.events_rows
    ids = back.agg(F.min("event_id"), F.max("event_id"), F.count_distinct("event_id")).collect()[0]
    # monotonic, dense, no overlap between tick batches
    assert ids[0] == 1 and ids[2] == stats.events_rows

    orders = writer.read_table(spark, str(tmp_path), "orders")
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
    zero tick overruns after the warmup tick — matches-or-beats the
    reference's single-node throughput with headroom."""
    # a throwaway tick in a scratch dir absorbs JVM/codegen warmup,
    # as the reference's first HTTP batch absorbs connection setup
    IngestLoop(
        spark, str(tmp_path / "warmup"), events_per_tick=200, orders_per_tick=40
    )._tick(0)
    loop = IngestLoop(
        spark, str(tmp_path / "lake"), events_per_tick=200, orders_per_tick=40,
        tick_seconds=1.0,
    )
    stats = loop.run(seconds=8.0)
    assert stats.ticks >= 7
    assert stats.overruns == 0, f"{stats.overruns} overruns at 2x reference rate"
    assert stats.events_rows == stats.ticks * 200
    assert stats.orders_rows == stats.ticks * 40
