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
    kind: str  # registry | gateway | rest
    sql: str | None
    started_at: float  # unix seconds
    duration_s: float
    rows: int
    ok: bool
    error: str | None = None


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
        self._append(
            QueryLogEntry(name, kind, sql, t0, time.perf_counter() - tp, int(ctx["rows"]), True)
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
            (e.name, e.kind, e.sql, e.started_at, e.duration_s, e.rows, e.ok, e.error)
            for e in self.entries()
        ]
        return spark.createDataFrame(
            rows,
            "name string, kind string, sql string, started_at double, "
            "duration_s double, rows bigint, ok boolean, error string",
        )
