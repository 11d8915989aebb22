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
