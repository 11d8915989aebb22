"""The deployed demo stack in one call — the reference's
docker-compose topology (docker-compose.yml:4-27: clickhouse-server +
stream_data_realtime.py producer + Flask dashboard, with MVs
populating at insert and TTLs merging in the background) recovered on
Spark:

- **ingest**: :class:`streaming.ingest.IngestLoop` — the external
  producer (reference stream_data_realtime.py: 100 ev/s + 20 ord/s).
- **MV maintenance**: one shared insert-triggered stream per source
  table plus the background Compactor, via :func:`streaming.mv.
  maintenance` — with the ``mv_retention_days`` knob, every
  threshold-triggered fold also expires state past the horizon.
- **lake TTL**: :class:`streaming.retention.TTLService` with the
  reference's retention policy (04-add-ttl.sql:29,37-38 — 90 d on
  events, 1 y on orders), doom→grace→reap, non-blocking for readers.
- **app** (optional): the Flask REST/SSE dashboard, ingest-enabled
  against the lake; pass ``sf_dir`` (the analytical parquet tables
  the dashboard's queries read — ``create_app`` registers that
  catalog) whenever ``with_app`` is set.

``clock`` pins "today" for the TTL horizon — the generator's data
lives in a fixed 2024 window (sources/generator.py), so demos and
tests inject a clock inside it (the corpus fixture pins 2024-03-30
the same way); production data uses the default wall clock.

Shutdown order matters and ``stop()`` owns it: producer first (no new
parts), then the maintenance streams (drain), then compactor and TTL
(no folds/drops against stopped streams).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from clickhouse_realtime_analytics_demo_spark.streaming import mv, retention
from clickhouse_realtime_analytics_demo_spark.streaming.ingest import IngestLoop

# reference retention policy (04-add-ttl.sql:29,37-38)
DEFAULT_LAKE_TTL = (("events", "event_date", 90), ("orders", "order_date", 365))


@dataclass
class DemoStack:
    """Handles for every running component; ``stop()`` tears down in
    dependency order. Built by :func:`start_stack`."""

    ingest: IngestLoop
    queries: list = field(default_factory=list)  # StreamingQuery handles
    compactors: list = field(default_factory=list)
    ttl: retention.TTLService | None = None
    app: object = None  # Flask app (not started; caller serves it)

    def stop(self) -> None:
        self.ingest.stop()
        for q in self.queries:
            q.stop()
        for c in self.compactors:
            c.stop()
        if self.ttl is not None:
            self.ttl.stop()


def start_stack(
    spark: SparkSession,
    lake_dir: str,
    sf_dir: str | None = None,
    events_per_tick: int = 100,
    orders_per_tick: int = 20,
    tick_seconds: float = 1.0,
    ingest_users: int = 1000,
    run_seconds: float = 86_400.0,
    mv_retention_days: int | None = None,
    lake_ttl: tuple = DEFAULT_LAKE_TTL,
    ttl_interval_s: float = 3600.0,
    ttl_grace_seconds: float | None = None,
    ttl_gate_on_checkpoint: bool = False,
    max_parts: int = 128,
    compact_interval_s: float = 30.0,
    clock=None,
    with_app: bool = False,
) -> DemoStack:
    """Start the full live topology against ``lake_dir`` and return
    its handles. Components come up consumer-first (streams before the
    producer) so the first parts are consumed on the first trigger,
    like the reference where MVs exist before the streamer starts."""
    specs = list(mv.mv_specs().values())
    by_source: dict[str, list] = {}
    for s in specs:
        by_source.setdefault(s.source, []).append(s)

    queries, compactors = [], []
    for source, group in sorted(by_source.items()):
        q, comp = mv.maintenance(
            spark,
            f"{lake_dir}/{source}/yyyymm=*",
            f"{lake_dir}/mv",
            group,
            f"{lake_dir}/ckpt_{source}",
            retention_days=mv_retention_days,
            max_parts=max_parts,
            compact_interval_s=compact_interval_s,
            clock=clock,
        )
        queries.append(q)
        compactors.append(comp)

    ttl = None
    if lake_ttl:
        # ``ttl_gate_on_checkpoint``: the synchronous-MV parity opt-in
        # (ClickHouse MVs populate AT insert, so TTL can never outrun
        # them) — each TTL pass checks the table's maintenance-stream
        # checkpoint and never physically removes a partition holding
        # a file the MVs haven't durably consumed. Table and stream
        # source share a name here (events/orders), so the mapping is
        # direct.
        gates = (
            {
                f"{lake_dir}/{table}": f"{lake_dir}/ckpt_{table}"
                for table, _dc, _d in lake_ttl
                if table in by_source
            }
            if ttl_gate_on_checkpoint
            else None
        )
        ttl = retention.TTLService(
            targets=[
                (f"{lake_dir}/{table}", date_col, days)
                for table, date_col, days in lake_ttl
            ],
            spark=spark,
            interval_s=ttl_interval_s,
            grace_seconds=ttl_grace_seconds,
            clock=clock,
            gate_on_checkpoint=gates,
        ).start()

    ingest = IngestLoop(
        spark,
        lake_dir,
        events_per_tick=events_per_tick,
        orders_per_tick=orders_per_tick,
        tick_seconds=tick_seconds,
        n_users=ingest_users,
    )
    ingest.start(seconds=run_seconds)

    app = None
    if with_app:
        from clickhouse_realtime_analytics_demo_spark.app.rest import create_app
        from clickhouse_realtime_analytics_demo_spark.ops.query_log import QueryLog

        app = create_app(
            spark, sf_dir or lake_dir, query_log=QueryLog(), lake_dir=lake_dir
        )

    return DemoStack(
        ingest=ingest, queries=queries, compactors=compactors, ttl=ttl, app=app
    )
