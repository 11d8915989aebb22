"""Misra-Gries heavy hitters (operators/sketches.py).

The registered query (doc_token_heavy_hitters) is oracle-checked in
test_correctness; here we pin the sketch's GUARANTEE — the property
that makes the two-pass plan exact — plus adversarial shapes and
partition invariance the oracle can't probe.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest

from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.operators import sketches, text
from tests.conftest import SF_DIR


def _mg_stream(stream: list[str], counters: int, batch: int = 97) -> dict:
    """Run the mergeable-summary trim over a batched stream."""
    counts: dict = {}
    for i in range(0, len(stream), batch):
        s = pd.Series(stream[i : i + batch]).value_counts()
        counts = sketches._mg_merge_trim(counts, s, counters)
    return counts


def test_mg_trim_survival_guarantee_random():
    """Every key with count > N/(counters+1) survives the summary —
    the Misra-Gries bound, exercised over seeded random Zipf-ish
    streams at several counter widths."""
    rng = random.Random(11)
    for counters in (4, 16, 64):
        # Zipf-ish: key i drawn with weight 1/(i+1).
        keys = [f"k{i}" for i in range(500)]
        weights = [1.0 / (i + 1) for i in range(500)]
        stream = rng.choices(keys, weights=weights, k=20_000)
        truth: dict = {}
        for s in stream:
            truth[s] = truth.get(s, 0) + 1
        summary = _mg_stream(stream, counters)
        assert len(summary) <= counters
        thresh = len(stream) / (counters + 1.0)
        for key, c in truth.items():
            if c > thresh:
                assert key in summary, (counters, key, c, thresh)


def test_mg_trim_adversarial_unique_tail():
    """A few heavy keys drowned in a long unique tail — the shape that
    breaks naive 'keep the first k seen' heuristics."""
    stream = ["heavy_a"] * 900 + ["heavy_b"] * 600 + [f"u{i}" for i in range(9000)]
    random.Random(7).shuffle(stream)
    summary = _mg_stream(stream, counters=32)
    assert "heavy_a" in summary and "heavy_b" in summary


def test_candidates_superset_across_partitions(spark):
    """Union-over-partitions guarantee: heavies survive even when
    their occurrences are split across many input partitions."""
    rows = (
        [("hot1",)] * 400
        + [("hot2",)] * 250
        + [(f"cold{i}",) for i in range(3000)]
    )
    random.Random(3).shuffle(rows)
    df = spark.createDataFrame(rows, "token string").repartition(8)
    cand = {
        r["token"]
        for r in sketches.mg_candidates(df, "token", counters=64).collect()
    }
    assert {"hot1", "hot2"} <= cand
    # Bounded output: ≤ counters per partition.
    assert len(cand) <= 64 * 8


def _naive_topk(df, k):
    return (
        df.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(k)
        .collect()
    )


def test_exact_heavy_hitters_equals_naive_and_partition_invariant(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
    )
    toks = docs.select(F.explode(text.tokens(F.lower(F.col("text")))).alias("token"))
    want = [(r["token"], r["cnt"]) for r in _naive_topk(toks, 20)]
    for parts in (3, 7):
        got = sketches.exact_heavy_hitters(
            toks.repartition(parts), "token", k=20, counters=4096
        ).collect()
        assert [(r["token"], r["cnt"]) for r in got] == want
        assert [r["rnk"] for r in got] == list(range(1, len(got) + 1))


def test_exact_even_with_tight_counters(spark):
    """counters far below the distinct-key count still yields exact
    top-k as long as the k-th count clears N/(counters+1)."""
    rows = [("hh%d" % (i % 5),) for i in range(5000)] + [
        (f"tail{i}",) for i in range(2000)
    ]
    random.Random(5).shuffle(rows)
    df = spark.createDataFrame(rows, "token string").repartition(6)
    got = sketches.exact_heavy_hitters(df, "token", k=5, counters=32).collect()
    assert [(r["token"], r["cnt"]) for r in got] == [
        ("hh0", 1000), ("hh1", 1000), ("hh2", 1000), ("hh3", 1000), ("hh4", 1000)
    ]


def test_exactness_margin_pinned_on_testdata(spark):
    """Certify the registered query's exactness precondition on the
    current corpus with headroom (threshold is margin > 1.0)."""
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
    )
    toks = docs.select(F.explode(text.tokens(F.lower(F.col("text")))).alias("token"))
    margin = sketches.exactness_margin(toks, "token", k=20, counters=4096)
    assert margin > 5.0, margin


def test_counters_validation():
    with pytest.raises(ValueError):
        sketches.mg_candidates(None, "token", counters=0)


def test_heavy_hitters_plan_shape(spark):
    """Executed-plan contract (the test_plan_snapshots harness forbids
    Python nodes in its set, so the mapInPandas-bearing query pins its
    shape here — the media-query precedent): exactly ONE
    MapInPandasExec (the bounded candidate pass), the candidate prune
    as a broadcast semi join, a TakeOrdered top-k, no cartesian
    product, and every WindowExec partitioned (the rank window rides
    the non-foldable constant-key trick over the LIMIT-k frame)."""
    from clickhouse_realtime_analytics_demo_spark.queries import all_queries
    from tests.test_plan_snapshots import _walk

    df = all_queries()["doc_token_heavy_hitters"].fn(spark, SF_DIR)
    df.collect()
    counts: dict[str, int] = {}
    for node in _walk(df._jdf.queryExecution().executedPlan()):
        cls = node.getClass().getSimpleName()
        counts[cls] = counts.get(cls, 0) + 1
        if cls == "WindowExec":
            assert node.partitionSpec().size() > 0, "unpartitioned WindowExec"
    assert counts.get("MapInPandasExec", 0) == 1, counts
    assert counts.get("BroadcastHashJoinExec", 0) == 1, counts
    assert counts.get("TakeOrderedAndProjectExec", 0) >= 1, counts
    assert counts.get("CartesianProductExec", 0) == 0, counts
    assert counts.get("BatchEvalPythonExec", 0) == 0, counts
