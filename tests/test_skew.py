"""Skew utilities: salted join correctness (vs plain join) and
bucketed-join exchange elimination (plan-asserted)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.operators import skew


def test_salted_join_matches_plain_join(spark):
    # heavy skew: 90% of fact rows share key 1
    fact = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 50).select(F.col("id").alias("k"), (F.col("id") * 100).alias("attr"))
    plain = fact.join(dim, "k").select("k", "v", "attr")
    salted = skew.salted_join(fact, dim, "k").select("k", "v", "attr")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_outer(spark):
    fact = spark.range(0, 100).select((F.col("id") % 7).alias("k"), F.col("id").alias("v"))
    dim = spark.createDataFrame([(0, "a"), (1, "b")], "k long, attr string")
    plain = fact.join(dim, "k", "left").select("k", "v", "attr")
    salted = skew.salted_join(fact, dim, "k", how="left").select("k", "v", "attr")
    assert sorted(map(repr, salted.collect())) == sorted(map(repr, plain.collect()))


def test_salt_spreads_hot_key(spark):
    fact = spark.range(0, 1000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    salt_counts = (
        fact.withColumn("s", (F.abs(F.xxhash64(*fact.columns)) % 8).cast("int"))
        .groupBy("s")
        .count()
        .collect()
    )
    assert len(salt_counts) == 8  # the single hot key fans across all salts
    assert max(r["count"] for r in salt_counts) < 1000 * 0.3


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    big = spark.range(0, 5000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("x"))
    other = spark.range(0, 5000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("y"))
    skew.write_bucketed(big, "t_big", "k", num_buckets=4, sort_key="k",
                        path=str(warehouse / "t_big"))
    skew.write_bucketed(other, "t_other", "k", num_buckets=4, sort_key="k",
                        path=str(warehouse / "t_other"))
    yield "t_big", "t_other"
    spark.sql("DROP TABLE IF EXISTS t_big")
    spark.sql("DROP TABLE IF EXISTS t_other")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the planner must choose SMJ — at real scale
    # neither side fits in a broadcast; that's the case bucketing serves.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = skew.bucketed_join(spark, left, right, "k")
        assert df.count() == 5000
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, f"bucketed scan not used:\n{plan[:800]}"
        assert "Exchange hashpartitioning" not in plan, (
            f"bucketed join should not shuffle:\n{plan[:800]}"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_unbucketed_join_does_shuffle(spark):
    # control: the same join without bucketing needs exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 5000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("x"))
        b = spark.range(0, 5000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("y"))
        plan = a.join(b, "k")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_cap_group_size(spark):
    """Groups above the cap vanish entirely; groups at/below pass
    through untouched (the pre-quadratic-expansion safety valve)."""
    from clickhouse_realtime_analytics_demo_spark.operators.skew import cap_group_size

    df = spark.createDataFrame(
        [(1, i) for i in range(10)] + [(2, i) for i in range(3)] + [(3, 0)],
        "k long, v long",
    )
    out = cap_group_size(df, ["k"], max_rows=3)
    got = {(r.k, r.v) for r in out.collect()}
    assert {k for k, _ in got} == {2, 3}
    assert len(got) == 4
