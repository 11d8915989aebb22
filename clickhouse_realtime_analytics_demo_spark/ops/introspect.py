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
