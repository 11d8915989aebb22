"""Bucketed tables: pre-shuffled storage for shuffle-free joins.

The reference engine co-locates joins by sharding/ORDER BY keys at
insert time (SURVEY §4 X1/X2 — data is laid out once so recurring
queries never re-sort it). The Spark-native equivalent is bucketing:
``bucketBy(N, key).sortBy(key)`` at write time hash-partitions rows
into N fixed buckets per table, and a join between two tables
bucketed by the same key into the same N runs with ZERO exchange —
each task zips bucket i of both sides.

Why this matters at 100 TB: a fact⋈fact join (lineitem⋈orders on
orderkey) shuffles BOTH sides on every query — at 100 TB that is the
dominant cost, paid again per query. Bucketing pays that shuffle
once at ingest and amortizes it over every subsequent join, the same
trade the reference's insert-time ORDER BY makes.
``tests/test_bucketing.py`` proves the executed plan drops from 2+
Exchanges (plain parquet) to 0 (bucketed), with identical results.

Bucket-count sizing: N should be chosen so one bucket of the LARGER
table fits a task comfortably (~128–512 MB) — at 100 TB lineitem
that is N in the thousands; N must match on both sides for the
co-located join (Spark 4 can coalesce mismatched counts when one
divides the other — ``spark.sql.bucketing.coalesceBucketsInJoin``).

Gotcha encoded here: each WRITE TASK emits one file per bucket it
sees, so a repartition-less write from T tasks yields up to T files
per bucket (T× the open file handles and T× the small files).
Writers therefore repartition by the bucket key first — exactly one
sorted file per bucket. Note the join-side SMJ still plans LOCAL
per-bucket sorts (Spark only trusts write-side order behind
``spark.sql.legacy.bucketedTableScan.outputOrdering``); those are
in-task and exchange-free — the shuffle is what bucketing removes,
and the write-side sort still buys row-group min/max skipping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_bucketed", "bucketed_table"]


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str,
    num_buckets: int,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet table bucketed (and sorted) by
    ``bucket_col`` into ``num_buckets`` hash buckets."""
    (
        df.repartition(num_buckets, F.col(bucket_col))
        .write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table through the catalog (bucket metadata is
    only visible via ``spark.table``, not path reads)."""
    return spark.table(table)
