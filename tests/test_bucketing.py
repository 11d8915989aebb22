"""Bucketed co-located join: the pre-shuffled layout must join with
ZERO exchanges and bit-identical results vs the plain parquet plan
(which shuffles both sides). Tables live in a throwaway database
under /tmp so the repo warehouse stays clean."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.catalog import table
from clickhouse_realtime_analytics_demo_spark.sources.bucketing import (
    bucketed_table,
    write_bucketed,
)
from tests.conftest import SF_DIR

_DB = "bucketing_test"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    loc = tempfile.mkdtemp(prefix="bucketing_db_")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {_DB} LOCATION '{loc}'")
    orders = table(spark, SF_DIR, "orders")
    lineitem = table(spark, SF_DIR, "lineitem")
    write_bucketed(orders, f"{_DB}.orders_b", bucket_col="o_orderkey", num_buckets=8)
    write_bucketed(lineitem, f"{_DB}.lineitem_b", bucket_col="l_orderkey", num_buckets=8)
    yield f"{_DB}.orders_b", f"{_DB}.lineitem_b"
    spark.sql(f"DROP DATABASE IF EXISTS {_DB} CASCADE")
    shutil.rmtree(loc, ignore_errors=True)


def _join_agg(o, li):
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"),
        )
        .orderBy("o_orderstatus")
    )


def test_bucketed_join_has_zero_exchanges(spark, bucketed_tables):
    ob, lb = bucketed_tables
    # disable broadcast: at test SF the tables are tiny enough to
    # broadcast, which would mask the property under test (at 100 TB
    # neither side broadcasts — the co-located SMJ is the real plan)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q = _join_agg(bucketed_table(spark, ob), bucketed_table(spark, lb))
        # executedPlan: exchange *insertion* is decided at planning —
        # a co-located bucketed SMJ plans none before the
        # (unavoidable) aggregation exchange.
        joined = q._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    join_part = joined.split("HashAggregate")[-1]  # below the agg = the join subtree
    assert "Exchange" not in join_part, join_part
    assert "SortMergeJoin" in joined or "ShuffledHashJoin" in joined
    # (Spark still plans LOCAL per-bucket sorts — the bucketed scan
    # only advertises outputOrdering behind
    # spark.sql.legacy.bucketedTableScan.outputOrdering — but those
    # are in-task, spill-bounded, and exchange-free; the shuffle is
    # what bucketing removes.)


def test_plain_join_shuffles_both_sides(spark):
    o = table(spark, SF_DIR, "orders")
    li = table(spark, SF_DIR, "lineitem")
    # disable broadcast so the comparison is shuffle-join vs bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _join_agg(o, li)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    join_part = plan.split("HashAggregate")[-1]
    assert join_part.count("Exchange") >= 2  # both sides re-shuffle per query


def test_bucketed_results_identical(spark, bucketed_tables):
    ob, lb = bucketed_tables
    plain = _join_agg(table(spark, SF_DIR, "orders"), table(spark, SF_DIR, "lineitem"))
    buck = _join_agg(bucketed_table(spark, ob), bucketed_table(spark, lb))
    assert [tuple(r) for r in plain.collect()] == [tuple(r) for r in buck.collect()]


def test_one_file_per_bucket(spark, bucketed_tables):
    ob, _ = bucketed_tables
    # repartition-by-key before write ⇒ exactly one file per bucket,
    # which is what keeps the scan's outputOrdering usable (module
    # docstring gotcha)
    files = [
        f
        for f in spark.table(ob).inputFiles()
    ]
    assert len(files) == 8, files
