"""windowFunnel operator: handcrafted chains pinning ordered-stage
semantics — strict timestamp increase, anchor-window cutoffs (incl.
the superset-min edge the oracle equivalence relies on), max-over-
anchors, and a 4-stage chain exercising the join loop. The registered
``window_funnel`` query is swept by tests/test_correctness.py and the
determinism gate."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.operators.funnel import (
    funnel_levels,
    window_funnel,
)

_T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(uid, offset_s, etype):
    return (uid, _T0 + dt.timedelta(seconds=offset_s), etype)


def _depths(spark, rows, window_s=600, k=3):
    stages = [F.col("event_type") == s for s in ("view", "click", "purchase", "signup")[:k]]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = window_funnel(df, stages=stages, window_us=window_s * 1_000_000)
    return {r["user_id"]: r["depth"] for r in out.collect()}


def test_complete_chain(spark):
    d = _depths(spark, [_ev(1, 0, "view"), _ev(1, 10, "click"), _ev(1, 20, "purchase")])
    assert d == {1: 3}


def test_purchase_outside_anchor_window(spark):
    # click at 590 (inside), purchase at 650: inside (click, click+600]
    # but OUTSIDE (view, view+600] — the superset-min edge; must be 2
    d = _depths(spark, [_ev(1, 0, "view"), _ev(1, 590, "click"), _ev(1, 650, "purchase")])
    assert d == {1: 2}


def test_strict_increase_equal_ts(spark):
    # click at the SAME timestamp as the view does not advance
    d = _depths(spark, [_ev(1, 0, "view"), _ev(1, 0, "click")])
    assert d == {1: 1}


def test_order_matters(spark):
    # purchase BEFORE the click: stage 3 unmatched after stage 2
    d = _depths(spark, [_ev(1, 0, "view"), _ev(1, 5, "purchase"), _ev(1, 10, "click")])
    assert d == {1: 2}


def test_max_over_anchors(spark):
    # first view's chain dies (click too late for purchase); second
    # view anchors a complete chain → max depth 3
    rows = [
        _ev(1, 0, "view"),
        _ev(1, 700, "view"),
        _ev(1, 710, "click"),
        _ev(1, 720, "purchase"),
    ]
    assert _depths(spark, rows) == {1: 3}


def test_no_anchor_no_row(spark):
    d = _depths(spark, [_ev(1, 0, "click"), _ev(2, 0, "view")])
    assert d == {2: 1}


def test_four_stage_chain(spark):
    rows = [
        _ev(1, 0, "view"),
        _ev(1, 1, "click"),
        _ev(1, 2, "purchase"),
        _ev(1, 3, "signup"),
        # user 2 stalls at stage 3
        _ev(2, 0, "view"),
        _ev(2, 1, "click"),
        _ev(2, 2, "purchase"),
    ]
    assert _depths(spark, rows, k=4) == {1: 4, 2: 3}


def test_min_next_stage_not_any(spark):
    # two clicks; the EARLIEST click (min) anchors stage 3. A purchase
    # valid only for the later click must not count: strictly, with
    # min-stitching, purchase at 15 > click_min=5 counts — construct
    # the discriminating case: purchase BETWEEN the clicks.
    rows = [_ev(1, 0, "view"), _ev(1, 5, "click"), _ev(1, 8, "purchase"), _ev(1, 10, "click")]
    assert _depths(spark, rows) == {1: 3}


def test_levels_report(spark):
    rows = [
        _ev(1, 0, "view"),
        _ev(1, 1, "click"),
        _ev(1, 2, "purchase"),
        _ev(2, 0, "view"),
        _ev(2, 1, "click"),
        _ev(3, 0, "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    stages = [F.col("event_type") == s for s in ("view", "click", "purchase")]
    per_user = window_funnel(df, stages=stages, window_us=600_000_000)
    levels = {r["level"]: r["users"] for r in funnel_levels(per_user, 3).collect()}
    assert levels == {1: 3, 2: 2, 3: 1}


def test_rejects_single_stage(spark):
    df = spark.createDataFrame([_ev(1, 0, "view")], "user_id long, ts timestamp, event_type string")
    with pytest.raises(ValueError):
        window_funnel(df, stages=[F.col("event_type") == "view"], window_us=1)


def test_window_is_partitioned(spark):
    df = spark.createDataFrame([_ev(1, 0, "view")], "user_id long, ts timestamp, event_type string")
    stages = [F.col("event_type") == s for s in ("view", "click", "purchase")]
    plan = (
        window_funnel(df, stages=stages, window_us=1_000_000)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan


# --- sequenceMatch (unwindowed ordered-chain existence) ---------------

from clickhouse_realtime_analytics_demo_spark.operators.funnel import (  # noqa: E402
    sequence_match,
)


def _sm_depths(spark, rows, k=3):
    stages = [F.col("event_type") == s for s in ("view", "click", "purchase")[:k]]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = sequence_match(df, stages=stages)
    return {r["user_id"]: r["depth"] for r in out.collect()}


def test_sm_unbounded_gap_matches(spark):
    # weeks between stages — windowFunnel(600s) would stop at 1, the
    # pattern form matches anywhere in the history
    d = _sm_depths(
        spark,
        [_ev(1, 0, "view"), _ev(1, 14 * 86400, "click"), _ev(1, 30 * 86400, "purchase")],
    )
    assert d == {1: 3}


def test_sm_order_violation(spark):
    # purchase exists but only BEFORE the earliest later click
    d = _sm_depths(spark, [_ev(1, 0, "view"), _ev(1, 5, "purchase"), _ev(1, 10, "click")])
    assert d == {1: 2}


def test_sm_strict_increase_equal_ts(spark):
    d = _sm_depths(spark, [_ev(1, 0, "view"), _ev(1, 0, "click")])
    assert d == {1: 1}


def test_sm_greedy_earliest_never_forecloses(spark):
    # two views (0, 100); the only click (50) sits between them; the
    # only purchase (60) follows it — greedy anchors at view=0 and
    # still completes; anchoring at view=100 would find nothing
    d = _sm_depths(
        spark,
        [
            _ev(1, 0, "view"),
            _ev(1, 100, "view"),
            _ev(1, 50, "click"),
            _ev(1, 60, "purchase"),
        ],
    )
    assert d == {1: 3}


def test_sm_no_stage1_absent(spark):
    d = _sm_depths(spark, [_ev(1, 0, "click"), _ev(1, 5, "purchase"), _ev(2, 0, "view")])
    assert d == {2: 1}


def test_sm_rejects_single_stage(spark):
    with pytest.raises(ValueError):
        _sm_depths(spark, [_ev(1, 0, "view")], k=1)
