"""Exact per-group quantiles: pinned nearest-rank semantics on
handcrafted groups + plan shape (one exchange for both windows).
The registered ``order_value_quantiles`` is swept by
tests/test_correctness.py and the determinism gate."""

from __future__ import annotations

import pytest

from clickhouse_realtime_analytics_demo_spark.operators.quantiles import exact_group_quantiles


@pytest.fixture(scope="module")
def out(spark):
    df = spark.createDataFrame(
        # g=a: 1..10 — p50 → floor(.5*9)+1 = rank 5 → value 5
        [("a", float(v), v) for v in range(1, 11)]
        # g=b: single value — every prob hits rank 1
        + [("b", 42.0, 1)]
        # g=c: all-equal values — any rank returns 7.0
        + [("c", 7.0, t) for t in range(1, 5)],
        "g string, v double, t long",
    )
    rows = exact_group_quantiles(
        df, group_cols=("g",), value_col="v", tie_col="t", probs=(0.0, 0.5, 1.0)
    ).collect()
    return {(r["g"], r["prob"]): r["quantile"] for r in rows}


def test_nearest_rank_values(out):
    assert out[("a", 0.0)] == 1.0  # rank 1
    assert out[("a", 0.5)] == 5.0  # floor(0.5*9)+1 = 5
    assert out[("a", 1.0)] == 10.0  # rank n


def test_single_row_group(out):
    assert out[("b", 0.0)] == out[("b", 0.5)] == out[("b", 1.0)] == 42.0


def test_all_ties_group(out):
    assert out[("c", 0.0)] == out[("c", 0.5)] == out[("c", 1.0)] == 7.0


def test_one_row_per_group_prob(out):
    assert len(out) == 9  # 3 groups x 3 probs, no duplicates


def test_single_exchange_plan(spark):
    df = spark.createDataFrame([("a", 1.0, 1)], "g string, v double, t long")
    q = exact_group_quantiles(
        df, group_cols=("g",), value_col="v", tie_col="t", probs=(0.5,)
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # rank + count windows share one shuffle
    assert "SinglePartition" not in plan


def test_empty_probs_rejected(spark):
    df = spark.createDataFrame([("a", 1.0, 1)], "g string, v double, t long")
    with pytest.raises(ValueError):
        exact_group_quantiles(df, group_cols=("g",), value_col="v", tie_col="t", probs=())


def test_approx_within_rank_tolerance(spark):
    """The sketch path must land within 1% rank error of the exact
    path (percentile_approx accuracy=10k ⇒ ε=1e-4; 1% is a loose,
    box-independent bound): for each (segment, prob), the approx
    value's true rank must be within ±1% · n of floor(p(n-1))+1."""
    from clickhouse_realtime_analytics_demo_spark.queries import all_queries
    from tests.conftest import SF_DIR_MID

    import duckdb

    qs = all_queries()
    approx = {
        (r["segment"], round(r["prob"], 2)): r["quantile"]
        for r in qs["order_value_quantiles_approx"].fn(spark, SF_DIR_MID).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW j AS SELECT c.c_mktsegment AS segment, o.o_totalprice AS v"
        f" FROM '{SF_DIR_MID}/orders.parquet' o"
        f" JOIN '{SF_DIR_MID}/customer.parquet' c ON c.c_custkey = o.o_custkey"
    )
    for (seg, prob), val in approx.items():
        n, rank_of_val = con.execute(
            "SELECT COUNT(*), COUNT(*) FILTER (WHERE v <= ?) FROM j WHERE segment = ?",
            [val, seg],
        ).fetchone()
        target = int(prob * (n - 1)) + 1
        assert abs(rank_of_val - target) <= max(1, 0.01 * n), (
            seg,
            prob,
            val,
            rank_of_val,
            target,
            n,
        )
    assert len(approx) == 25  # 5 segments x 5 probs
