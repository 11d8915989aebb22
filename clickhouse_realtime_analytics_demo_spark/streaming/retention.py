"""TTL retention (SURVEY §2.9 ST9, §4 X11).

The reference sets background part-level TTLs — 90 d on events, 1 y on
orders (04-add-ttl.sql:29,37-38) — chosen over DELETE because TTL
"operates on entire parts" (04-add-ttl.sql:92; stream_data.py:87-141).

The Spark analog with the same cost model: month-partitioned tables →
retention = DROP whole yyyymm partition directories older than the
cutoff (metadata-only, no rewrite), plus an optional row-level rewrite
ONLY for the single boundary month. Non-blocking for readers in the
same way (old partitions disappear between queries).

Semantics under LIVE load (tests/test_retention_load.py; the
reference's TTL likewise runs in the background against live inserts,
04-add-ttl.sql:46-99):

- **readers**: a query that listed files before a drop skips the
  missing ones (``spark.sql.files.ignoreMissingFiles``, session.py) —
  rows in a dropped file are expired by definition, so nothing
  unexpired is lost. No reader error, no retry needed.
- **MV streams**: input files committed to the checkpoint and later
  dropped are never re-read, so maintenance streams are unaffected; a
  file dropped in the narrow window between listing and read is
  skipped by the same setting (its rows were expired).
- **MVs keep their aggregates**: retention on the RAW table does not
  retract MV rows — the rollup deliberately outlives the raw data
  (the reference keeps 90 d of events under longer-lived MV
  summaries). MV totals equal the aggregation over ALL ingested rows,
  dropped or not.
- **backdated inserts**: a row older than the cutoff written AFTER a
  TTL pass survives until the next pass — eventual, bounded-staleness
  expiry, exactly like part-level TTL between background merges.
- **one divergence from ClickHouse**: the reference's MVs populate
  SYNCHRONOUSLY at INSERT, so a row always reaches every MV before
  TTL can touch it; our maintenance streams lag by up to a trigger.
  A part dropped in that window expires its rows from the MV too
  (they were, by definition, already past the cutoff — but the
  reference would have rolled them up first). Operationally moot —
  TTL cadence is hours/days, MV lag is seconds — but if exact parity
  matters, gate ``apply_ttl`` on the maintenance checkpoint having
  consumed the candidate partitions, as the live-load test does.
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
