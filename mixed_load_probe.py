"""Mixed-workload probe: ingest + incremental-MV maintenance +
dashboard queries running SIMULTANEOUSLY (VERDICT r5 next-round #1).

Every bench/scale number so far was quiesced; the reference's defining
mode is a live dashboard polling at 1-5 s while inserts stream in and
5 insert-triggered MVs update (/root/reference/app_interactive.py:83,
templates_interactive/interactive_dashboard.html:602-605,
ARCHITECTURE.md:85-89: ingest -> MV update -> query sees fresh
aggregates <1 s later). This probe measures that loop end to end:

- ``IngestLoop`` at a multiple of the reference rate (100 events/s +
  20 orders/s, 1 s ticks) into a fresh lake;
- all 5 MV maintenance streams (``streaming/mv.py``) consuming the
  lake concurrently, 1 s triggers;
- a dashboard query loop (the /api/live + /api/stats shapes, issued
  directly against the live lake/MVs) recording per-query wall
  latency — run once QUIESCED first for an interference baseline,
  then under full load;
- a freshness sampler comparing the write-side cursor trail
  (``IngestStats.tick_marks``) against read-side MV visibility
  (``mv.read_final`` totals): lag(tick) = first sample time at which
  the MV's re-aggregated total covers the tick's cumulative rows,
  minus the tick's completion time. This is the reference's
  "event written -> visible in dashboard aggregate" loop, measured
  from OUTSIDE the engine (a sample is itself a full reader query,
  so the lag includes real read cost — an upper bound, not a flattering
  internal timestamp).

Reported: p50/p95 query latency (quiesced vs loaded), per-micro-batch
MV trigger latency from StreamingQuery progress, p50/p95 freshness
lag, and achieved ingest rate. One JSON line on stdout; prose table
in MIXEDLOAD.md.

Usage: ``python mixed_load_probe.py [seconds] [rate_multiplier]``
(defaults 60 s, 1x reference rate). The gating test
(tests/test_mixedload.py) runs a shortened version of the same
harness.
"""

from __future__ import annotations

import json
import statistics
import sys
import tempfile
import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.sources import generator, writer
from clickhouse_realtime_analytics_demo_spark.streaming import mv, tail
from clickhouse_realtime_analytics_demo_spark.streaming.ingest import IngestLoop


def _pct(xs: list[float], p: float) -> float:
    if not xs:
        return float("nan")
    xs = sorted(xs)
    i = min(len(xs) - 1, max(0, int(round(p * (len(xs) - 1)))))
    return xs[i]


@dataclass
class MixedLoadResult:
    seconds: float
    rate_mult: int
    seed_events: int
    ingested_events: int
    ingested_orders: int
    events_per_s: float
    query_lat_quiesced: dict[str, list[float]] = field(default_factory=dict)
    query_lat_loaded: dict[str, list[float]] = field(default_factory=dict)
    mv_batch_ms: dict[str, list[float]] = field(default_factory=dict)
    freshness_lag_s: list[float] = field(default_factory=list)
    uncovered_ticks: int = 0
    funnel_refreshes: int = 0
    spin_ms: dict = field(default_factory=dict)

    def summary(self) -> dict:
        def q(d: dict[str, list[float]]) -> dict:
            flat = [x for xs in d.values() for x in xs]
            return {
                "p50": round(_pct(flat, 0.50), 3),
                "p95": round(_pct(flat, 0.95), 3),
                "n": len(flat),
            }

        batches = [x for xs in self.mv_batch_ms.values() for x in xs]
        return {
            "metric": "mixed_load",
            "seconds": round(self.seconds, 1),
            "rate_mult": self.rate_mult,
            "events_per_s": round(self.events_per_s, 1),
            "query_quiesced": q(self.query_lat_quiesced),
            "query_loaded": q(self.query_lat_loaded),
            "mv_batch_ms_p50": round(_pct(batches, 0.50), 1),
            "mv_batch_ms_p95": round(_pct(batches, 0.95), 1),
            "freshness_p50_s": round(_pct(self.freshness_lag_s, 0.50), 2),
            "freshness_p95_s": round(_pct(self.freshness_lag_s, 0.95), 2),
            "freshness_n": len(self.freshness_lag_s),
            "uncovered_ticks": self.uncovered_ticks,
            "funnel_refreshes": self.funnel_refreshes,
            "spin_ms": self.spin_ms,
        }


def seed_lake(spark: SparkSession, lake: str, n_events: int = 20_000, n_orders: int = 4_000) -> int:
    """History before the live window — the dashboards aggregate over
    existing data plus the stream, like the reference's preloaded
    tables."""
    writer.write_table(
        generator.events(spark, n=n_events, n_users=1000, seed=7, partitions=4),
        lake, "events", mode="overwrite",
    )
    writer.write_table(
        generator.orders(spark, n=n_orders, n_users=1000, seed=7, partitions=2),
        lake, "orders", mode="overwrite",
    )
    return n_events


def _dashboard_queries(spark: SparkSession, lake: str, specs: dict[str, mv.MVSpec], mv_dir: str,
                       refresh_dir: str | None = None):
    """The /api/live + /api/stats query mix, issued against the LIVE
    lake and MV tables (the REST routes read the static sf dir; the
    live dashboard's identity is reading tables that are being
    written)."""
    cursor = {"v": 0}

    def stats_by_type():
        ev = writer.read_table(spark, lake, "events")
        return ev.groupBy("event_type").agg(
            F.count("*").alias("events"),
            F.approx_count_distinct("user_id").alias("unique_users"),
        ).collect()

    def daily_rollup():
        ev = writer.read_table(spark, lake, "events")
        return (
            ev.groupBy("event_date")
            .agg(F.count("*").alias("events"), F.sum("revenue").alias("revenue"))
            .orderBy("event_date")
            .collect()
        )

    def mv_daily_top():
        return (
            mv.read_final(spark, f"{mv_dir}/daily_user_activity", specs["daily_user_activity"])
            .orderBy(F.desc("total_events"))
            .limit(10)
            .collect()
        )

    def mv_product_top():
        return (
            mv.read_final(spark, f"{mv_dir}/mv_product_revenue", specs["mv_product_revenue"])
            .groupBy("product_id")
            .agg(F.sum("total_revenue").alias("revenue"))
            .orderBy(F.desc("revenue"))
            .limit(10)
            .collect()
        )

    def tail_poll():
        ev = writer.read_table(spark, lake, "events")
        rows = tail.poll(ev, cursor["v"], limit=50).collect()
        if rows:
            cursor["v"] = max(r.event_id for r in rows)
        return rows

    # the four routes wired in round 7 (/api/live/event-types,
    # /geographic, /top-users, /conversion-rate), issued as the same
    # query shapes against the LIVE lake so their latency under load
    # is measured like the rest of the reference dashboard poll set
    def live_event_types():
        from pyspark.sql import Window

        ev = writer.read_table(spark, lake, "events")
        per_type = ev.groupBy("event_type").agg(F.count("*").alias("events"))
        # unpartitioned window AFTER aggregation (≤|event types| rows)
        return per_type.withColumn(
            "percentage",
            F.round(F.col("events") * 100.0 / F.sum("events").over(Window.partitionBy()), 2),
        ).orderBy(F.desc("events")).collect()

    def live_geographic():
        ev = writer.read_table(spark, lake, "events")
        return (
            ev.groupBy("country")
            .agg(
                F.count("*").alias("events"),
                F.approx_count_distinct("user_id").alias("users"),
                F.sum(F.when(F.col("event_type") == "purchase", F.col("revenue"))).alias("revenue"),
            )
            .orderBy(F.desc("events"))
            .limit(10)
            .collect()
        )

    def live_top_users():
        ev = writer.read_table(spark, lake, "events")
        return (
            ev.groupBy("user_id")
            .agg(
                F.count("*").alias("event_count"),
                F.countDistinct("event_type").alias("event_types"),
                F.sum("revenue").alias("total_revenue"),
                F.max("event_timestamp").alias("last_seen"),
            )
            .orderBy(F.desc("event_count"), "user_id")
            .limit(10)
            .collect()
        )

    def live_conversion():
        ev = writer.read_table(spark, lake, "events")
        c = lambda t: F.count(F.when(F.col("event_type") == t, 1))  # noqa: E731
        return ev.agg(
            c("page_view").alias("page_views"),
            c("add_to_cart").alias("cart_adds"),
            c("purchase").alias("purchases"),
        ).collect()

    def live_funnel_depth():
        # r9 (VERDICT #2): the windowFunnel temporal operator on the
        # live poll mix — ordered page_view→add_to_cart→purchase depth
        # within 1 h, over the lake being written
        from clickhouse_realtime_analytics_demo_spark.operators import funnel

        ev = writer.read_table(spark, lake, "events")
        t = F.col("event_type")
        per_user = funnel.window_funnel(
            ev,
            stages=[t == "page_view", t == "add_to_cart", t == "purchase"],
            window_us=3_600_000_000,
            time_col="event_timestamp",
        )
        return funnel.funnel_levels(per_user, 3).orderBy("level").collect()

    def live_funnel_mv():
        # r9: the funnel served the way a 1 s poller would actually
        # deploy it — from the refreshable snapshot (RefreshScheduler;
        # cadence = the interval registered at setup, 10 s in the
        # probe), turning the heaviest poll into a tiny read
        from clickhouse_realtime_analytics_demo_spark.streaming.refresh import (
            read_snapshot,
        )

        snap = read_snapshot(spark, f"{refresh_dir}/funnel_depth")
        return [] if snap is None else snap.orderBy("level").collect()

    # a deployment serves the funnel route FROM the snapshot — the
    # poll mix carries exactly one funnel reader: the MV read when the
    # refresher runs, the on-demand operator otherwise
    out_extra = (
        {"live_funnel_mv": live_funnel_mv}
        if refresh_dir
        else {"live_funnel_depth": live_funnel_depth}
    )

    return out_extra | {
        "stats_by_type": stats_by_type,
        "daily_rollup": daily_rollup,
        "mv_daily_top": mv_daily_top,
        "mv_product_top": mv_product_top,
        "tail_poll": tail_poll,
        "live_event_types": live_event_types,
        "live_geographic": live_geographic,
        "live_top_users": live_top_users,
        "live_conversion": live_conversion,
    }


def _query_loop(queries: dict, out: dict[str, list[float]], stop: threading.Event,
                min_iters: int = 0, spark: SparkSession | None = None,
                poll_interval_s: float = 1.0) -> None:
    """Round-robin the dashboard mix until stopped (and at least
    ``min_iters`` full rounds), recording wall latency per query,
    pausing ``poll_interval_s`` between rounds — the reference
    dashboards poll on 1-5 s timers (interactive_dashboard's refresh
    loops), not in a tight loop; continuous polling would overstate
    dashboard load relative to the contract being measured.
    MV queries before the first micro-batch lands raise (no table
    yet) — skipped, as the reference dashboard's first poll 404s."""
    if spark is not None:  # FAIR pool: dashboards share cores with
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", "dashboard")
    iters = 0
    while not stop.is_set() or iters < min_iters:
        for name, fn in queries.items():
            t0 = time.perf_counter()
            try:
                fn()
            except Exception:
                continue  # MV table not created yet
            out.setdefault(name, []).append(time.perf_counter() - t0)
        iters += 1
        if stop.is_set() and iters >= min_iters:
            break
        stop.wait(poll_interval_s)


def run_mixed_load(
    spark: SparkSession,
    workdir: str,
    seconds: float = 60.0,
    rate_mult: int = 1,
    quiesced_seconds: float = 10.0,
    freshness_sample_s: float = 0.25,
    # 0.5 s triggers halve source-discovery delay on the 32-core probe
    # box; on smaller sessions (the 8-core test fixture) the doubled
    # trigger rate costs ingest throughput more than it buys freshness
    # — the gate test passes 1.0
    trigger_seconds: float = 0.5,
    mv_names: tuple[str, ...] = (
        "daily_user_activity",
        "mv_product_revenue",
        "mv_user_funnel",
        "mv_hourly_events",
        "mv_country_stats",
    ),
) -> MixedLoadResult:
    lake = f"{workdir}/lake"
    mv_dir = f"{workdir}/mv"
    specs = {n: s for n, s in mv.mv_specs().items() if n in mv_names}
    seed_events = seed_lake(spark, lake)

    res = MixedLoadResult(
        seconds=seconds, rate_mult=rate_mult, seed_events=seed_events,
        ingested_events=0, ingested_orders=0, events_per_s=0.0,
    )
    # r9: the funnel refreshable MV (VERDICT r8 #2 follow-through: the
    # MIXEDLOAD r9 run showed the on-demand funnel is the heaviest
    # poll at 1.27 s loaded p50; this is the documented answer — serve
    # the 1 s pollers from a snapshot on the refresh cadence
    # registered below, 10 s in this probe)
    from clickhouse_realtime_analytics_demo_spark.operators import funnel as funnel_ops
    from clickhouse_realtime_analytics_demo_spark.streaming.refresh import (
        RefreshScheduler,
    )

    refresh_dir = f"{workdir}/refresh"

    def _funnel_build(s: SparkSession):
        s.sparkContext.setLocalProperty("spark.scheduler.pool", "maintenance")
        ev = writer.read_table(s, lake, "events")
        t = F.col("event_type")
        per_user = funnel_ops.window_funnel(
            ev,
            stages=[t == "page_view", t == "add_to_cart", t == "purchase"],
            window_us=3_600_000_000,
            time_col="event_timestamp",
        )
        return funnel_ops.funnel_levels(per_user, 3)

    refresher = RefreshScheduler(spark, tick_seconds=0.5)
    refresher.register(
        "funnel_depth", _funnel_build, interval_seconds=10.0,
        path=f"{refresh_dir}/funnel_depth",
    )
    refresher.refresh_now("funnel_depth")  # pre-warm: pollers never 404

    queries = _dashboard_queries(spark, lake, mv.mv_specs(), mv_dir, refresh_dir)

    # ---- phase 1: quiesced baseline (no ingest, no MV streams) ----
    stop_q = threading.Event()
    qt = threading.Thread(
        target=_query_loop, args=(queries, res.query_lat_quiesced, stop_q), daemon=True
    )
    qt.start()
    time.sleep(quiesced_seconds)
    stop_q.set()
    qt.join()

    # ---- phase 2: full mixed load ----
    # FAIR pools (session.py sets spark.scheduler.mode=FAIR): ingest,
    # MV maintenance, and dashboards each get a fair core share — under
    # plain FIFO the dashboards' full scans starve the 1 s ingest ticks
    # (measured: 52 of 100 ev/s sustained, freshness p95 11 s).
    loop = IngestLoop(
        spark, lake,
        events_per_tick=100 * rate_mult, orders_per_tick=20 * rate_mult,
        tick_seconds=1.0, n_users=1000, scheduler_pool="ingest",
    )
    flagship = specs["daily_user_activity"]
    # SS copies the caller thread's local properties into the stream
    # execution thread at start() (the documented way to pool streams).
    # One multiplexed maintenance stream per SOURCE (the ClickHouse
    # shape: each INSERT block read once, all attached MVs fed from it)
    # instead of one stream per MV — see mv.start_incremental_multi.
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", "maintenance")
    streams, stream_specs = [], []
    for source in ("events", "orders"):
        group = [s for s in specs.values() if s.source == source]
        if not group:
            continue
        streams.append(
            mv.start_incremental_multi(
                spark, f"{lake}/{source}/yyyymm=*", mv_dir, group,
                f"{workdir}/ckpt_{source}", trigger_seconds=trigger_seconds,
                max_files_per_trigger=64,
            )
        )
        stream_specs.append(f"{source}[{len(group)} MVs]")
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)

    # warm-up: let the streams drain the SEED history before the live
    # window opens, so freshness measures steady state (the reference's
    # MVs are likewise caught up with preloaded data before the demo's
    # live inserts begin) — the first micro-batch is the whole 20k-row
    # seed and would otherwise charge ~3-5 s against the first ticks
    warm_deadline = time.perf_counter() + 60.0
    while time.perf_counter() < warm_deadline:
        try:
            total = (
                mv.read_final(spark, f"{mv_dir}/daily_user_activity", flagship)
                .agg(F.sum("total_events")).collect()[0][0] or 0
            )
            if total >= seed_events:
                break
        except Exception:
            pass
        time.sleep(0.5)

    samples: list[tuple[float, int]] = []  # (perf_counter at result, visible events)
    stop_s = threading.Event()

    def sampler():
        # the freshness sampler is itself a reader query — dashboard
        # pool. Visibility signal: SUM over the MV's partial rows.
        # total_events is a pure sum partial, so sum(partials) is
        # ALGEBRAICALLY identical to read_final(...).agg(sum(...)) —
        # same number, same files, minus the (event_date,user_id)
        # groupBy whose shuffle would make the probe's own sampling
        # cost the dominant term in the measured lag. Full read_final
        # latency is measured separately by the query loop's
        # mv_daily_top.
        path = f"{mv_dir}/daily_user_activity"
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", "dashboard")
        while not stop_s.is_set():
            try:
                total = (
                    spark.read.parquet(path)
                    .agg(F.sum("total_events")).collect()[0][0] or 0
                )
                samples.append((time.perf_counter(), int(total)))
            except Exception:
                pass  # first micro-batch not yet written
            stop_s.wait(freshness_sample_s)

    st = threading.Thread(target=sampler, daemon=True)
    st.start()
    refresher.start()  # the funnel refreshable MV joins the mixed load

    stop_q2 = threading.Event()
    qt2 = threading.Thread(
        target=_query_loop, args=(queries, res.query_lat_loaded, stop_q2, 0, spark),
        daemon=True,
    )
    qt2.start()

    # r10: effective-core-speed sampler for the whole window — this box
    # shows minute-scale performance oscillation (micro-batches 0.7 →
    # 2.6 s on identical code) with ~0% steal and phantom load-avg, so
    # a rate-gate miss needs direct evidence of whether the BOX was
    # slow. Same instrument as bench.py's.
    try:
        from bench import _SpinSampler

        spin = _SpinSampler()
        spin.start()
    except ImportError:  # bench.py not importable (unusual cwd)
        spin = None

    stats = loop.run(seconds=seconds)  # blocking

    if spin is not None:
        res.spin_ms = spin.stop()

    # drain: let MVs cover the final ticks (bounded wait)
    final_cursor = seed_events + stats.events_rows
    deadline = time.perf_counter() + 30.0
    while time.perf_counter() < deadline:
        if samples and samples[-1][1] >= final_cursor:
            break
        time.sleep(0.5)
    stop_q2.set()
    qt2.join()
    stop_s.set()
    st.join()
    refresher.stop()
    res.funnel_refreshes = refresher._jobs["funnel_depth"].runs
    for name, q in zip(stream_specs, streams):
        for prog in q.recentProgress:
            # PySpark 3.x surfaces progress as dicts; 4.x as
            # StreamingQueryProgress objects carrying .json
            if not isinstance(prog, dict):
                prog = json.loads(prog.json)
            if prog and prog.get("numInputRows", 0) > 0:
                res.mv_batch_ms.setdefault(name, []).append(
                    float(prog["durationMs"]["triggerExecution"])
                )
        q.stop()

    # freshness: first sample whose visible total covers each tick's cursor
    for t_tick, cum_events, _ in stats.tick_marks:
        covering = [t for t, total in samples if total >= seed_events + cum_events and t >= t_tick]
        if covering:
            res.freshness_lag_s.append(min(covering) - t_tick)
        else:
            res.uncovered_ticks += 1

    res.ingested_events = stats.events_rows
    res.ingested_orders = stats.orders_rows
    res.events_per_s = stats.events_per_s
    return res


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    rate_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    import os

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from clickhouse_realtime_analytics_demo_spark.session import get_spark

    spark = get_spark(app_name="mixed_load_probe", cpus=int(cpus), shuffle_partitions=32)
    with tempfile.TemporaryDirectory(prefix="mixedload-") as d:
        res = run_mixed_load(spark, d, seconds=seconds, rate_mult=rate_mult)
    out = res.summary()
    # per-query detail for the report
    detail = {
        name: {
            "quiesced_p50": round(_pct(res.query_lat_quiesced.get(name, []), 0.5), 3),
            "loaded_p50": round(_pct(res.query_lat_loaded.get(name, []), 0.5), 3),
            "loaded_p95": round(_pct(res.query_lat_loaded.get(name, []), 0.95), 3),
        }
        for name in sorted(set(res.query_lat_quiesced) | set(res.query_lat_loaded))
    }
    out["per_query"] = detail
    out["mv_batches"] = {k: len(v) for k, v in res.mv_batch_ms.items()}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
