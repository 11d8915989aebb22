"""Full deployed topology in one call (service.start_stack — the
reference docker-compose analog): producer + per-source MV maintenance
streams + Compactors + background lake TTL, running concurrently, torn
down in dependency order. Asserts the component invariants through the
COMPOSED stack: MV totals track the ingest cursor for BOTH sources,
the TTL service dooms and reaps an expired month while everything
runs, the dashboard serves the live partition state, no stream dies,
and teardown is clean.

The expired month is seeded as ``yyyymm=202312`` — outside the
generator's 2024-01..03 window — so the producer never recreates it
and the doom→reap cycle is deterministic under the test's compressed
TTL clock (grace 0, 0.5 s cadence). Partition TTL is name-based, like
the reference's part-level TTL."""

from __future__ import annotations

import time
from datetime import date
from pathlib import Path

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from clickhouse_realtime_analytics_demo_spark import service
from clickhouse_realtime_analytics_demo_spark.sources import generator, writer
from clickhouse_realtime_analytics_demo_spark.streaming import mv


def _wait(cond, deadline_s: float = 180.0, interval: float = 0.3):
    deadline = time.time() + deadline_s
    while time.time() < deadline:
        v = cond()
        if v:
            return v
        time.sleep(interval)
    return None


def test_start_stack_end_to_end(spark, tmp_path):
    lake = str(tmp_path)
    # seed an already-expired month the producer will never recreate
    old = Path(lake) / "events" / "yyyymm=202312"
    old.mkdir(parents=True)
    generator.events(spark, n=300, n_users=20, seed=3, partitions=1).coalesce(
        1
    ).write.mode("overwrite").parquet(str(old))

    ev_spec = mv.mv_specs()["daily_user_activity"]
    ord_spec = mv.mv_specs()["mv_product_revenue"]

    stack = service.start_stack(
        spark,
        lake,
        sf_dir=SF_DIR,  # the dashboard's analytical tables
        events_per_tick=40,
        orders_per_tick=10,
        tick_seconds=0.3,
        # clock 2024-03-15 - 74 d = cutoff 2024-01-01: only 202312 expires
        lake_ttl=(("events", "event_date", 74),),
        ttl_interval_s=0.5,
        ttl_grace_seconds=0.0,
        clock=lambda: date(2024, 3, 15),
        compact_interval_s=0.5,
        with_app=True,
    )
    try:
        def mv_total(spec, col):
            try:
                return (
                    mv.read_final(spark, f"{lake}/mv/{spec.name}", spec)
                    .agg(F.sum(col)).collect()[0][0] or 0
                )
            except Exception:
                return 0

        assert _wait(lambda: stack.ingest.stats.ticks >= 3), "producer never ticked"
        # the background TTL service dooms AND reaps the expired month
        # while producer/streams/compactors run
        assert _wait(
            lambda: stack.ttl.stats.get(f"{lake}/events", {}).get("reaped", 0) >= 1,
            deadline_s=60,
        ), f"TTL never reaped: {stack.ttl.stats}"
        assert _wait(lambda: not old.exists(), deadline_s=30)
        # dashboard over the same lake while everything runs: the
        # surviving partitions are the producer's live months
        rows = stack.app.test_client().get(
            "/api/system/parts?table=events"
        ).get_json()
        assert rows and all(r["state"] == "active" for r in rows)
        assert "yyyymm=202312" not in {r["partition"] for r in rows}

        # drain: stop the producer, then both sources' MV streams must
        # reach the final ingest cursors
        stack.ingest.stop()
        final_ev = stack.ingest.stats.events_rows
        final_ord = stack.ingest.stats.orders_rows
        assert final_ev > 0 and final_ord > 0
        assert _wait(lambda: mv_total(ev_spec, "total_events") >= final_ev), (
            f"events MV stalled below {final_ev}"
        )
        assert _wait(lambda: mv_total(ord_spec, "order_count") >= final_ord), (
            f"orders MV stalled below {final_ord}"
        )
        # streams alive the whole way
        assert all(q.exception() is None for q in stack.queries)
    finally:
        stack.stop()
    # teardown is clean: streams inactive, reader healthy, retention
    # enforced for bare-path readers too (the reap already ran live)
    assert all(not q.isActive for q in stack.queries)
    assert writer.read_table(spark, lake, "events").count() >= final_ev
    assert not old.exists()
