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


def _read_live_parts(spark: SparkSession, state_path: str) -> DataFrame:
    """Manifest-aware snapshot read of the live part set (the
    parts.live_part_dirs contract): readers never see a half-published
    fold, and a fold's inputs stay resolvable for the whole tombstone
    grace window even after the merge publishes."""
    from clickhouse_realtime_analytics_demo_spark.streaming import parts as store

    dirs = [str(d) for d in store.live_part_dirs(state_path)]
    if not dirs:
        raise FileNotFoundError(f"no state parts under {state_path}")
    try:
        return spark.read.parquet(*dirs)
    except Exception as e:  # one re-list covers the listing→read race
        if not store.is_transient_listing_race(e):
            raise
        dirs = [str(d) for d in store.live_part_dirs(state_path)]
        if not dirs:
            raise FileNotFoundError(f"no state parts under {state_path}") from e
        return spark.read.parquet(*dirs)


def read_topk(
    spark: SparkSession,
    state_path: str,
    keys: list[str],
    k: int,
    counters: int = 2048,
) -> DataFrame:
    """Merge-on-read final: top-k children per group with their
    (lower bound, undercount ≤ N/(counters+1)) weights."""
    parts = _read_live_parts(spark, state_path)
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


def compact(
    spark: SparkSession,
    state_path: str,
    keys: list[str],
    counters: int = 2048,
    checkpoint_dir: str | None = None,
    retain_where=None,
) -> bool:
    """Fold all live parts into one (the AggregatingMergeTree
    background merge), through the shared crash-safe part store
    (``streaming/parts.py``): the fold is written to a dot-hidden dir,
    published by a single atomic rename with a manifest excluding its
    inputs, and the inputs are tombstoned for a grace window rather
    than deleted under concurrent readers. A crash at any step is
    replayed or rolled back on the next call — readers never see a
    half-committed fold or a stranded ``_folding`` dir (the pre-r12
    delete-then-rename scheme had both failure modes).

    With ``checkpoint_dir``, only stream-committed batch ids fold (the
    mv.compact commit gate) so crash-replayed batches can't re-appear
    next to a fold that already contains them. Returns True if a fold
    published.

    ``retain_where``: optional retention predicate over the state's
    GROUP KEY columns (the mv.compact contract; the ClickHouse
    ``TTL ... DELETE``-on-merge analog for AggregatingMergeTree
    state). Whole expired groups are dropped BEFORE the fold, so at a
    date-keyed state the steady-state key space is
    ``retention_days × |daily active groups|`` instead of unbounded —
    the one growth term the multi-day probe left to the data model.
    A retention fold is a rewrite, not just a merge: it runs even at
    one live part (min_parts=1), or an already-compacted store could
    never expire anything."""
    from clickhouse_realtime_analytics_demo_spark.streaming import parts as store

    def _fold(df: DataFrame) -> DataFrame:
        if retain_where is not None:
            df = df.filter(retain_where)
        return merge_states(df, keys, counters).coalesce(1)

    return store.compact_parts(
        state_path,
        read_parts=lambda dirs: spark.read.parquet(*dirs),
        fold=_fold,
        checkpoint_dir=checkpoint_dir,
        min_parts=1 if retain_where is not None else 2,
    )
