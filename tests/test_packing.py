"""Token-offset sharding (operators/packing.py): distributed exact
prefix sums must equal the naive sequential cumsum under ANY
partitioning, and the plan must never push data-sized input through
an unpartitioned window."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.operators import packing


def _rows(n, spark, partitions):
    # token counts vary per id; ids deliberately unsorted across partitions
    return (
        spark.range(0, n, numPartitions=partitions)
        .select(F.col("id").alias("doc_id"), ((F.col("id") * 37) % 91 + 1).alias("tok"))
    )


def test_prefix_sum_matches_sequential(spark):
    df = _rows(1000, spark, 8)
    got = {
        r["doc_id"]: r["prefix_sum"]
        for r in packing.exact_prefix_sum(df, "doc_id", "tok").collect()
    }
    run = 0
    for i in range(1000):
        assert got[i] == run, f"id {i}: {got[i]} != {run}"
        run += (i * 37) % 91 + 1


def test_prefix_sum_partitioning_invariant(spark):
    a = packing.exact_prefix_sum(_rows(500, spark, 1), "doc_id", "tok", num_buckets=4)
    b = packing.exact_prefix_sum(_rows(500, spark, 16), "doc_id", "tok", num_buckets=32)
    ra = sorted(tuple(r) for r in a.select("doc_id", "prefix_sum").collect())
    rb = sorted(tuple(r) for r in b.select("doc_id", "prefix_sum").collect())
    assert ra == rb


def test_pack_semantics_and_straddle(spark):
    """shard_id = cut index where the doc STARTS; a doc whose tokens
    cross a cut stays in its starting shard (GPT-style packing)."""
    rows = [(0, 300), (1, 300), (2, 500), (3, 24)]
    df = spark.createDataFrame(rows, "doc_id long, tok long")
    out = {
        r["doc_id"]: (r["token_offset"], r["shard_id"])
        for r in packing.pack_token_budget(df, 512, F.col("tok"), num_buckets=2).collect()
    }
    # offsets: 0, 300, 600, 1100 → shards 0, 0, 1, 2
    assert out == {0: (0, 0), 1: (300, 0), 2: (600, 1), 3: (1100, 2)}
    # doc 1 straddles the 512 cut (300..600) and belongs to shard 0
    # doc 3's n_tokens column rides along
    assert "n_tokens" in packing.pack_token_budget(df, 512, F.col("tok")).columns


def test_no_unpartitioned_window_over_data(spark):
    """Every WindowExec in the executed plan must be partitioned; the
    only windows present run over the bounded per-bucket aggregate or
    within a bucket — never the whole relation on one task."""
    df = packing.exact_prefix_sum(_rows(2000, spark, 8), "doc_id", "tok")
    df.collect()

    def walk(node):
        yield node
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            yield from walk(node.executedPlan())
            return
        if name.endswith("QueryStageExec"):
            yield from walk(node.plan())
            return
        for i in range(node.children().size()):
            yield from walk(node.children().apply(i))

    saw_window = 0
    for node in walk(df._jdf.queryExecution().executedPlan()):
        if node.getClass().getSimpleName() == "WindowExec":
            saw_window += 1
            assert node.partitionSpec().size() > 0, "unpartitioned WindowExec"
    assert saw_window >= 1  # the within-bucket running sum
