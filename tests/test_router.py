"""Projection router: copy materialization, deterministic choice by
sort-prefix coverage, fallback to base, and result equivalence across
copies (the projection invariant: every copy answers identically)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

from clickhouse_realtime_analytics_demo_spark.catalog import table
from clickhouse_realtime_analytics_demo_spark.plans.router import ProjectionRouter


@pytest.fixture(scope="module")
def router(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("projections"))
    events = table(spark, SF_DIR, "events")
    r = ProjectionRouter()
    r.add_copy(spark, "events", events, ("event_type", "ts"), base)
    r.add_copy(spark, "events", events, ("user_id", "ts"), base)
    return r


def test_choice_by_prefix(router):
    assert router.choose("events", frozenset({"event_type"})).name == "events_by_event_type_ts"
    assert router.choose("events", frozenset({"user_id", "ts"})).name == "events_by_user_id_ts"
    # no covered prefix -> no copy
    assert router.choose("events", frozenset({"value"})) is None
    assert router.choose("unknown_table", frozenset({"x"})) is None


def test_longest_prefix_wins(router):
    # (user_id, ts) covers 2 prefix keys; (event_type, ts) covers 0.
    assert router.choose("events", frozenset({"user_id", "ts"})).sort_key == ("user_id", "ts")
    # full tie (both cover 2): registration order breaks it — first wins.
    assert router.choose("events", frozenset({"user_id", "ts", "event_type"})).sort_key == (
        "event_type",
        "ts",
    )


def test_resolve_equivalence(spark, router):
    base = table(spark, SF_DIR, "events")
    routed = router.resolve(spark, "events", base, {"event_type"})
    a = sorted(
        tuple(r) for r in base.filter("event_type = 'purchase'").select("event_id").collect()
    )
    b = sorted(
        tuple(r) for r in routed.filter("event_type = 'purchase'").select("event_id").collect()
    )
    assert a == b and len(a) > 0
    assert router.decisions[-1][2] == "events_by_event_type_ts"


def test_resolve_fallback_logs_base(spark, router):
    base = table(spark, SF_DIR, "events")
    out = router.resolve(spark, "events", base, {"value"})
    assert out is base
    assert router.decisions[-1][2] == "<base>"
