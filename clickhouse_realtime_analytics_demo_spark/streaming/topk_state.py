"""Mergeable top-k (heavy hitters) MV state — the ClickHouse
``topKState`` / ``topKMerge`` analog (AggregatingMergeTree pattern,
reference `init-scripts/01-create-tables.sql:119-132` uses the same
State/Merge machinery for countState/sumState; topK is the member of
that family the demo's "top users" dashboards would reach for at
scale).

State = per-group Misra-Gries summary stored as a ``map<string,long>``
column, one part per micro-batch (idempotent ``b=<id>`` overwrite, the
``streaming/mv.py`` crash-replay contract). Merge-on-read sums
per-key weights across parts relationally (explode → sum → MG trim) —
the mergeable-summaries theorem (Agarwal et al. 2013) gives the
combined summary the same guarantee as a single pass: every key with
true count > N/(counters+1) survives, and every reported weight is a
lower bound undercounting by at most N/(counters+1).

Everything is JVM-side DataFrame ops — the trim is a rank window
partitioned by the group keys plus a per-group cut join, never a
Python row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _trim(counts: DataFrame, keys: list[str], counters: int) -> DataFrame:
    """MG trim per group: subtract the (counters+1)-th largest weight
    from every counter and keep the positive ones. Input/output:
    (keys..., child, w). Deterministic tie-break (w desc, child asc).
    """
    w = Window.partitionBy(*keys).orderBy(F.col("w").desc(), F.col("child").asc())
    # The cut rides a second window over the SAME partition spec —
    # Catalyst computes both in one WindowExec on one exchange; no
    # groups-sized join/broadcast anywhere.
    wall = Window.partitionBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = counts.withColumn("_r", F.row_number().over(w)).withColumn(
        "_cut",
        F.max(F.when(F.col("_r") == counters + 1, F.col("w"))).over(wall),
    )
    return (
        ranked.filter(F.col("_r") <= counters)
        .withColumn("w", F.col("w") - F.coalesce(F.col("_cut"), F.lit(0)))
        .filter(F.col("w") > 0)
        .drop("_r", "_cut")
    )


def topk_partial(
    batch: DataFrame, keys: list[str], child: str, counters: int = 2048
) -> DataFrame:
    """One MG-summary row per group for this micro-batch: exact
    (keys, child) counts trimmed to ``counters`` — an exact count map
    when the batch's per-group child cardinality fits ``counters``
    (the common micro-batch case), a true MG summary beyond it."""
    counts = (
        batch.filter(F.col(child).isNotNull())
        .groupBy(*keys, F.col(child).cast("string").alias("child"))
        .agg(F.count("*").alias("w"))
    )
    trimmed = _trim(counts, keys, counters)
    return trimmed.groupBy(*keys).agg(
        F.map_from_entries(F.collect_list(F.struct("child", "w"))).alias("topk_mg")
    )


def write_batch(
    batch: DataFrame,
    keys: list[str],
    child: str,
    state_path: str,
    batch_id: int,
    counters: int = 2048,
) -> None:
    """Idempotent part write (the mv.write_batch contract: a replayed
    foreachBatch overwrites ``b=<id>`` with identical content —
    no double counts). One file per batch: the summary is bounded at
    |groups touched| × counters entries by construction."""
    topk_partial(batch, keys, child, counters).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{state_path}/b={batch_id}")


def merge_states(
    parts: DataFrame, keys: list[str], counters: int = 2048
) -> DataFrame:
    """topKMerge: fold any number of summary rows per group into one.
    Relational merge — explode the maps, sum per (group, child), MG
    trim — so it distributes like any aggregation and never holds a
    group's summaries in one task's Python heap."""
    exploded = parts.select(*keys, F.explode("topk_mg").alias("child", "w"))
    summed = exploded.groupBy(*keys, "child").agg(F.sum("w").alias("w"))
    trimmed = _trim(summed, keys, counters)
    return trimmed.groupBy(*keys).agg(
        F.map_from_entries(F.collect_list(F.struct("child", "w"))).alias("topk_mg")
    )


def read_topk(
    spark: SparkSession,
    state_path: str,
    keys: list[str],
    k: int,
    counters: int = 2048,
) -> DataFrame:
    """Merge-on-read final: top-k children per group with their
    (lower bound, undercount ≤ N/(counters+1)) weights."""
    parts = spark.read.parquet(f"{state_path}/b=*")
    merged = merge_states(parts, keys, counters)
    entries = merged.select(*keys, F.explode("topk_mg").alias("child", "w"))
    w = Window.partitionBy(*keys).orderBy(F.col("w").desc(), F.col("child").asc())
    return (
        entries.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .withColumnRenamed("w", "est_count")
        .orderBy(*keys, "rnk")
    )


def start_incremental(
    spark: SparkSession,
    source_dir: str,
    state_path: str,
    keys: list[str],
    child: str,
    checkpoint_dir: str,
    counters: int = 2048,
    trigger_seconds: float = 1,
    max_files_per_trigger: int | None = None,
):
    """Streaming maintenance job (the mv.start_incremental shape):
    file-stream over the ingest directory → per-batch topK partial →
    idempotent part append. Returns the StreamingQuery handle."""
    from clickhouse_realtime_analytics_demo_spark.sources import schemas

    reader = spark.readStream.schema(schemas.EVENTS)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        write_batch(batch, keys, child, state_path, batch_id, counters)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{int(trigger_seconds * 1000)} milliseconds")
        .start()
    )


def compact(spark: SparkSession, state_path: str, keys: list[str],
            counters: int = 2048) -> None:
    """Fold all parts into one (the AggregatingMergeTree background
    merge). Reuses the b=<id> layout: the fold lands in the lowest
    part id and the rest are removed only after the new part commits.
    """
    import shutil
    from pathlib import Path

    root = Path(state_path)
    part_dirs = sorted(d for d in root.glob("b=*") if d.is_dir())
    if len(part_dirs) < 2:
        return
    parts = spark.read.parquet(f"{state_path}/b=*")
    folded = merge_states(parts, keys, counters)
    tmp = root / "_folding"
    folded.coalesce(1).write.mode("overwrite").parquet(str(tmp))
    for d in part_dirs:
        shutil.rmtree(d)
    tmp.rename(part_dirs[0])
