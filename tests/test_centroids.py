"""label_centroids: handcrafted fixed-point semantics (negative
components floor DOWNWARD, not toward zero) + map-side combine shape.
Engine parity is swept by tests/test_correctness.py via
``embedding_centroids``."""

from __future__ import annotations

from clickhouse_realtime_analytics_demo_spark.operators.similarity import label_centroids


def test_fixed_point_and_negatives(spark):
    df = spark.createDataFrame(
        [
            (0, [0.5, -0.5]),
            (0, [1.0, -0.0000015]),  # -1.5 micro floors to -2, not -1
            (1, [2.0, 2.0]),
        ],
        "label int, embedding array<float>",
    )
    rows = {(r["label"], r["dim"]): r for r in label_centroids(df).collect()}
    assert rows[(0, 0)]["sum_micro"] == 1_500_000
    assert rows[(0, 0)]["n_vecs"] == 2
    assert rows[(0, 0)]["avg_micro"] == 750_000.0
    assert rows[(0, 1)]["sum_micro"] == -500_000 - 2  # floor(-1.5) = -2
    assert rows[(1, 0)]["sum_micro"] == 2_000_000


def test_partial_aggregation_in_plan(spark):
    df = spark.createDataFrame([(0, [0.5])], "label int, embedding array<float>")
    plan = label_centroids(df)._jdf.queryExecution().executedPlan().toString()
    # partial_ aggregate before the exchange = map-side combine: the
    # shuffle carries labels x dim rows per task, not n x dim
    assert "partial_count" in plan or "partial" in plan
    assert plan.count("Exchange") == 1
