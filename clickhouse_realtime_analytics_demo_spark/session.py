"""SparkSession factory tuned for this engine.

Local-mode defaults match the test environment (local[32], 128 GiB) but
every knob is the one we would also set on a 1000-executor cluster:
AQE on (runtime re-plan, skew-join splitting, partition coalescing),
UTC session timezone (determinism), Arrow transfers for the Pandas-UDF
slow path, ZSTD parquet output.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "clickhouse-realtime-analytics-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_partitions = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", str(cpus)))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # FAIR job scheduling: a no-op until a thread opts into a named
        # pool (spark.scheduler.pool local property), at which point
        # concurrent workloads share cores fairly instead of FIFO —
        # without it, a full-scan dashboard query queues the 1 s ingest
        # ticks and MV micro-batches behind it (measured: ingest
        # sustained only 52 of 100 ev/s under FIFO mixed load;
        # mixed_load_probe.py / MIXEDLOAD.md). Same setting a
        # multi-tenant cluster serving live dashboards would run.
        .config("spark.scheduler.mode", "FAIR")
        # TTL retention drops whole partition directories while queries
        # and MV streams are live (streaming/retention.py). A reader
        # that listed files before the drop must skip them, not throw —
        # the same tolerance ClickHouse readers have for parts detached
        # mid-query, and the standard lakehouse setting for
        # retention-on-live-tables. Rows in a dropped file are expired
        # by definition, so skipping loses nothing that TTL didn't
        # already claim.
        .config("spark.sql.files.ignoreMissingFiles", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
