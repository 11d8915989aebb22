"""Storage/plan introspection — the ``system.parts`` / ``system.tables``
/ EXPLAIN analog (SURVEY §2.1 S10, §4 X13; reference use sites
examples/sample_queries.sql:460-543).

Table stats come from parquet footers (row counts, uncompressed/
compressed byte sizes) — metadata-only, no data scan, exactly how
ClickHouse's system.parts answers without touching columns. Explain
output is Catalyst's formatted plan, the counterpart of
``EXPLAIN indexes=1`` / ``EXPLAIN PIPELINE``.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

from clickhouse_realtime_analytics_demo_spark.catalog import TABLES


def format_readable_size(n: float) -> str:
    """ClickHouse ``formatReadableSize`` (sample_queries.sql:504-505):
    binary units, 2 decimals."""
    for tier, label in ((1024**4, "TiB"), (1024**3, "GiB"), (1024**2, "MiB"), (1024, "KiB")):
        if n >= tier:
            return f"{round(n / tier, 2)} {label}"
    return f"{round(n, 2)} B"


def table_stats(sf_dir: str, tables: tuple[str, ...] = TABLES) -> list[dict]:
    """Per-table storage stats from parquet metadata only.

    Returns rows shaped like the reference's compression-effectiveness
    query (sample_queries.sql:501-510: compressed_size,
    uncompressed_size via formatReadableSize, compression_ratio):
    rows, compressed/uncompressed bytes + readable strings,
    compression ratio, row-group (≈ "part") count.
    """
    out = []
    for name in tables:
        path = Path(sf_dir) / f"{name}.parquet"
        if not path.exists():
            continue
        # single-file (testdata layout) or a Spark-written directory of
        # part files — sum footers across parts either way
        files = (
            sorted(p for p in path.glob("*.parquet") if p.is_file())
            if path.is_dir()
            else [path]
        )
        if not files:
            continue
        rows = row_groups = columns = compressed = uncompressed = file_bytes = 0
        for f in files:
            meta = pq.ParquetFile(f).metadata
            rows += meta.num_rows
            row_groups += meta.num_row_groups
            columns = meta.num_columns
            compressed += sum(
                meta.row_group(g).column(c).total_compressed_size
                for g in range(meta.num_row_groups)
                for c in range(meta.num_columns)
            )
            uncompressed += sum(
                meta.row_group(g).column(c).total_uncompressed_size
                for g in range(meta.num_row_groups)
                for c in range(meta.num_columns)
            )
            file_bytes += f.stat().st_size
        out.append(
            {
                "table": name,
                "rows": rows,
                "row_groups": row_groups,
                "columns": columns,
                "compressed_bytes": compressed,
                "uncompressed_bytes": uncompressed,
                "compressed_size": format_readable_size(compressed),
                "uncompressed_size": format_readable_size(uncompressed),
                "compression_ratio": round(uncompressed / compressed, 2) if compressed else None,
                "file_bytes": file_bytes,
            }
        )
    return out


def partition_stats(table_path: str) -> list[dict]:
    """``system.parts`` ACTIVE/INACTIVE analog for a month-partitioned
    lake table under TTL retention (streaming/retention.py): one row
    per ``yyyymm=`` partition dir and per boundary-trim generation,
    with its lifecycle state — ClickHouse shows replaced parts as
    ``active = 0`` until the old-part cleanup ages them out, exactly
    the doom→grace→reap window here.

    States: ``active`` (serving reads), ``doomed`` (logically dropped
    or superseded; bytes held for the grace window — reported with
    the marker age), ``generation`` (a live trim rewrite serving in
    place of its doomed target), ``staged`` (torn/unpublished write).
    Metadata-only: footers + markers, no data scan."""
    import json as _json
    import time as _time

    from clickhouse_realtime_analytics_demo_spark.streaming.parts import (
        DOOMED_MARKER,
    )
    from clickhouse_realtime_analytics_demo_spark.streaming.retention import (
        TRIM_MANIFEST,
        _doom_ts,
        _gen_target,
    )

    base = Path(table_path)
    now = _time.time()
    out = []

    def _footer_stats(d: Path) -> tuple[int, int]:
        rows = nbytes = 0
        for f in sorted(d.glob("*.parquet")):
            rows += pq.ParquetFile(f).metadata.num_rows
            nbytes += f.stat().st_size
        return rows, nbytes

    for d in sorted(base.glob("yyyymm=*")):
        if not d.is_dir():
            continue
        ts = _doom_ts(d)
        rows, nbytes = _footer_stats(d)
        out.append(
            {
                "partition": d.name,
                "kind": "partition",
                "state": "doomed" if ts is not None else "active",
                "doomed_age_s": round(now - ts, 1) if ts is not None else None,
                "rows": rows,
                "bytes": nbytes,
                "size": format_readable_size(nbytes),
            }
        )
    for g in sorted(base.glob(".ttl-trim-*")):
        if not g.is_dir():
            continue
        ts = _doom_ts(g)
        if not (g / "_SUCCESS").exists():
            state = "staged"
        elif ts is not None:
            state = "doomed"  # superseded by its published target
        else:
            state = "generation"
        rows, nbytes = _footer_stats(g)
        target = _gen_target(g)
        replaced = None
        try:
            replaced = len(
                _json.loads((g / TRIM_MANIFEST).read_text())["replaced"]
            )
        except (OSError, ValueError, KeyError):
            pass
        out.append(
            {
                "partition": g.name,
                "kind": "trim_generation",
                "state": state,
                "target": f"yyyymm={target}" if target is not None else None,
                "replaced_files": replaced,
                "doomed_age_s": round(now - ts, 1) if ts is not None else None,
                "rows": rows,
                "bytes": nbytes,
                "size": format_readable_size(nbytes),
            }
        )
    return out


def dictionary_stats() -> list[dict]:
    """``system.dictionaries`` analog (sample_queries.sql:513-521;
    06-add-dictionaries.sql.disabled:221-234): name, layout, status,
    element_count per registered dictionary."""
    from clickhouse_realtime_analytics_demo_spark.plans.dictionaries import (
        loaded_dictionaries,
    )

    return list(loaded_dictionaries().values())


def function_stats() -> list[dict]:
    """``system.functions`` analog: every ClickHouse-dialect function
    name the gateway rewrites, with the Spark form it becomes (a
    1-arg probe rendering — enough for a dashboard to show the
    mapping). Names not listed pass through to Spark SQL untouched,
    exactly like ClickHouse's native functions."""
    from clickhouse_realtime_analytics_demo_spark.plans.dialect import (
        _PARAMETRIC,
        _REWRITES,
    )

    out = []
    for name in sorted(_REWRITES):
        try:
            spark_form = _REWRITES[name](["x", "'k'", "1"])
        except Exception:
            spark_form = "(context-dependent)"
        out.append({"name": name, "origin": "dialect", "spark_form": spark_form})
    for name in sorted(_PARAMETRIC):
        try:
            spark_form = _PARAMETRIC[name](["0.5"], ["x"])
        except Exception:
            spark_form = "(unsupported — raises with guidance)"
        out.append({"name": name, "origin": "parametric", "spark_form": spark_form})
    return out


def explain(df: DataFrame, mode: str = "formatted") -> str:
    """Formatted physical plan string (EXPLAIN surface, X13)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def explain_query(spark: SparkSession, sf_dir: str, name: str, mode: str = "formatted") -> str:
    """Explain a registered query by name."""
    from clickhouse_realtime_analytics_demo_spark.queries import all_queries

    return explain(all_queries()[name].fn(spark, sf_dir), mode)
