"""TTL retention (SURVEY §2.9 ST9, §4 X11).

The reference sets background part-level TTLs — 90 d on events, 1 y on
orders (04-add-ttl.sql:29,37-38) — chosen over DELETE because TTL
"operates on entire parts" (04-add-ttl.sql:92; stream_data.py:87-141).

The Spark analog with the same cost model: month-partitioned tables →
retention = DROP whole yyyymm partition directories older than the
cutoff (metadata-only, no rewrite), plus an optional row-level rewrite
ONLY for the single boundary month. Non-blocking for readers in the
same way (old partitions disappear between queries).
"""

from __future__ import annotations

import shutil
from datetime import date
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def expired_months(table_path: str, cutoff: date) -> list[int]:
    """yyyymm partition values strictly before the cutoff's month."""
    cutoff_month = cutoff.year * 100 + cutoff.month
    out = []
    for p in Path(table_path).glob("yyyymm=*"):
        try:
            val = int(p.name.split("=", 1)[1])
        except ValueError:
            continue
        if val < cutoff_month:
            out.append(val)
    return sorted(out)


def apply_ttl(
    spark: SparkSession,
    table_path: str,
    date_col: str,
    cutoff: date,
    trim_boundary_month: bool = False,
) -> dict:
    """Drop expired month partitions; optionally rewrite the boundary
    month to remove rows before the cutoff day. Returns a report."""
    dropped = expired_months(table_path, cutoff)
    for val in dropped:
        shutil.rmtree(Path(table_path) / f"yyyymm={val}", ignore_errors=True)

    trimmed_rows = 0
    boundary = cutoff.year * 100 + cutoff.month
    boundary_dir = Path(table_path) / f"yyyymm={boundary}"
    if trim_boundary_month and boundary_dir.exists():
        df = spark.read.parquet(str(boundary_dir))
        kept = df.filter(F.col(date_col) >= F.lit(cutoff))
        trimmed_rows = df.count() - kept.count()
        if trimmed_rows:
            tmp = str(boundary_dir) + ".tmp"
            kept.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(boundary_dir)
            Path(tmp).rename(boundary_dir)

    return {
        "dropped_partitions": dropped,
        "trimmed_boundary_rows": trimmed_rows,
        "cutoff": cutoff.isoformat(),
    }
