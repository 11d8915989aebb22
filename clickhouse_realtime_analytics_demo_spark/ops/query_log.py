"""Query log — the engine's ``system.query_log`` analog (SURVEY §2.1
S10, §4 X14; reference use site examples/sample_queries.sql:483-495).

ClickHouse records duration / rows / bytes per query server-side; our
analog records at the engine API layer (every gateway / REST / named-
registry execution funnels through ``record``). Entries live in a
bounded in-memory deque and can be snapshotted to a DataFrame for SQL
introspection — same read patterns as the reference corpus's
query-log queries (slowest-N, per-kind counts, memory/rows scanned).

Driver-side and O(1) per query — nothing here touches the executor
path, so it adds zero overhead at 100 TB.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from collections.abc import Iterator
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryLogEntry:
    name: str
    kind: str  # registry | gateway | rest | ingest
    sql: str | None
    started_at: float  # unix seconds
    duration_s: float
    rows: int
    ok: bool
    error: str | None = None
    # executor-side scan metrics (system.query_log read_rows /
    # read_bytes parity, sample_queries.sql:483-495) — populated from
    # the executed plan after materialization
    read_rows: int = 0
    read_bytes: int = 0
    read_files: int = 0


def scan_metrics(df: DataFrame) -> dict[str, int]:
    """Sum file-scan metrics from a MATERIALIZED DataFrame's executed
    plan (SQLMetrics are populated by the action): rows produced by
    scans after pushdown, bytes of files hit, file count. The
    ``read_rows``/``read_bytes`` columns of ClickHouse's
    system.query_log, from Spark's own instrumentation."""

    def walk(node):
        yield node
        name = node.getClass().getSimpleName()
        # AQE wraps the tree: descend into the adaptive plan's final
        # physical plan and into materialized query stages
        if name == "AdaptiveSparkPlanExec":
            yield from walk(node.executedPlan())
            return
        if name.endswith("QueryStageExec"):
            yield from walk(node.plan())
            return
        for i in range(node.children().size()):
            yield from walk(node.children().apply(i))

    out = {"read_rows": 0, "read_bytes": 0, "read_files": 0}
    try:
        plan = df._jdf.queryExecution().executedPlan()
        for node in walk(plan):
            if "Scan" not in node.getClass().getSimpleName():
                continue
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                key, value = kv._1(), kv._2().value()
                if key == "numOutputRows":
                    out["read_rows"] += value
                elif key == "filesSize":
                    out["read_bytes"] += value
                elif key == "numFiles":
                    out["read_files"] += value
    except Exception:  # AQE re-plans / non-file sources: best-effort
        pass
    return out


@dataclass
class QueryLog:
    capacity: int = 10_000
    _entries: deque = field(default_factory=deque, repr=False)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def __post_init__(self) -> None:
        self._entries = deque(maxlen=self.capacity)

    @contextmanager
    def record(self, name: str, kind: str = "registry", sql: str | None = None) -> Iterator[dict]:
        """Context manager timing one query execution. The body sets
        ``ctx['rows']`` after materializing results."""
        ctx = {"rows": 0}
        t0 = time.time()
        tp = time.perf_counter()
        try:
            yield ctx
        except Exception as exc:
            self._append(
                QueryLogEntry(
                    name, kind, sql, t0, time.perf_counter() - tp, 0, ok=False, error=str(exc)
                )
            )
            raise
        scans = ctx.get("scan", {})
        self._append(
            QueryLogEntry(
                name,
                kind,
                sql,
                t0,
                time.perf_counter() - tp,
                int(ctx["rows"]),
                True,
                read_rows=int(scans.get("read_rows", 0)),
                read_bytes=int(scans.get("read_bytes", 0)),
                read_files=int(scans.get("read_files", 0)),
            )
        )

    def _append(self, e: QueryLogEntry) -> None:
        with self._lock:
            self._entries.append(e)

    def entries(self) -> list[QueryLogEntry]:
        with self._lock:
            return list(self._entries)

    def to_df(self, spark: SparkSession) -> DataFrame:
        """Snapshot as a DataFrame for SQL over the log (slowest-N,
        error rates, per-kind stats — the sample_queries.sql:483-495
        read patterns)."""
        rows = [
            (
                e.name,
                e.kind,
                e.sql,
                e.started_at,
                e.duration_s,
                e.rows,
                e.ok,
                e.error,
                e.read_rows,
                e.read_bytes,
                e.read_files,
            )
            for e in self.entries()
        ]
        return spark.createDataFrame(
            rows,
            "name string, kind string, sql string, started_at double, "
            "duration_s double, rows bigint, ok boolean, error string, "
            "read_rows bigint, read_bytes bigint, read_files bigint",
        )
