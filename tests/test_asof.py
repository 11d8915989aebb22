"""As-of join operator: edge-case semantics + oracle parity.

The registered ``events_asof_order`` query is also swept by
tests/test_correctness.py and the determinism gate; this file pins
the operator's contract on handcrafted timelines where every edge is
known: inclusive vs strict equal-time, highest-tie wins, no-match
NULLs, payload-internal NULLs carried atomically, and tolerance
cutoff.
"""

from __future__ import annotations

import datetime as dt

import pytest

from clickhouse_realtime_analytics_demo_spark.operators.temporal import asof_join
from tests.conftest import SF_DIR_MID, compare_with_oracle


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-05 00:00:00")),  # between r1 and r2
            (2, 10, _ts("2024-01-10 00:00:00")),  # EXACTLY r2's time
            (3, 10, _ts("2024-01-01 00:00:00")),  # before any right row
            (4, 20, _ts("2024-06-01 00:00:00")),  # key with no right rows
            (5, 30, _ts("2024-03-01 00:00:00")),  # key 30: tie + null payload
        ],
        "event_id long, k long, t timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-02 00:00:00"), 1.0),
            (101, 10, _ts("2024-01-10 00:00:00"), 2.0),
            # key 30: two rows at the SAME time — highest rid wins —
            # and the winner carries a NULL value (must NOT fall back
            # to the older row's 9.9: struct payload is atomic).
            (200, 30, _ts("2024-02-01 00:00:00"), 9.9),
            (201, 30, _ts("2024-02-20 00:00:00"), 5.5),
            (202, 30, _ts("2024-02-20 00:00:00"), None),
        ],
        "rid long, k long, rt timestamp, val double",
    )
    return left, right


def _run(left, right, **kw):
    out = asof_join(
        left,
        right,
        left_on="k",
        right_on="k",
        left_time="t",
        right_time="rt",
        right_tie="rid",
        payload_cols=("rid", "val"),
        **kw,
    )
    return {r["event_id"]: r for r in out.collect()}


def test_backward_inclusive(frames):
    left, right = frames
    by_id = _run(left, right)
    assert len(by_id) == 5  # every left row survives
    assert by_id[1]["asof_rid"] == 100
    assert by_id[2]["asof_rid"] == 101  # equal time IS visible
    assert by_id[2]["asof_val"] == 2.0
    assert by_id[3]["asof_rid"] is None
    assert by_id[3]["asof_rt"] is None
    assert by_id[4]["asof_rid"] is None
    # tie at 2024-02-20: rid 202 (highest) wins, and its NULL val is
    # carried as-is — not patched from rid 201 or 200.
    assert by_id[5]["asof_rid"] == 202
    assert by_id[5]["asof_val"] is None


def test_backward_strict(frames):
    left, right = frames
    by_id = _run(left, right, strict=True)
    assert by_id[2]["asof_rid"] == 100  # equal time NOT visible
    assert by_id[1]["asof_rid"] == 100
    assert by_id[3]["asof_rid"] is None


def test_tolerance_cutoff(frames):
    left, right = frames
    by_id = _run(left, right, tolerance="5 days")
    # event 1 at 01-05 vs match at 01-02: within 5 days — kept.
    assert by_id[1]["asof_rid"] == 100
    # event 5 at 03-01 vs match at 02-20: 10 days — nulled out.
    assert by_id[5]["asof_rid"] is None
    assert by_id[5]["asof_rt"] is None


def test_prefix_collision_guard(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="_asof_"):
        asof_join(
            left.withColumn("_asof_x", left.event_id),
            right,
            left_on="k",
            right_on="k",
            left_time="t",
            right_time="rt",
            right_tie="rid",
            payload_cols=("rid",),
        )


def test_window_is_partitioned(frames):
    left, right = frames
    out = asof_join(
        left,
        right,
        left_on="k",
        right_on="k",
        left_time="t",
        right_time="rt",
        right_tie="rid",
        payload_cols=("rid", "val"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # the scale-killer shape is a windowing exchange to ONE partition
    assert "SinglePartition" not in plan


def test_events_asof_order_oracle_mid(spark):
    compare_with_oracle(spark, "events_asof_order", sf_dir=SF_DIR_MID)


def test_forward_inclusive(frames):
    left, right = frames
    by_id = _run(left, right, direction="forward")
    # event 1 at 01-05 → nearest FUTURE right row is rid 101 at 01-10
    assert by_id[1]["asof_rid"] == 101
    # equal time IS visible forward too
    assert by_id[2]["asof_rid"] == 101
    # event 3 at 01-01 → earliest right row 01-02
    assert by_id[3]["asof_rid"] == 100
    assert by_id[4]["asof_rid"] is None
    # key 30 at 03-01: no future rows at all
    assert by_id[5]["asof_rid"] is None


def test_forward_strict_and_tie(frames):
    left, right = frames
    by_id = _run(left, right, direction="forward", strict=True)
    assert by_id[2]["asof_rid"] is None  # equal time invisible, nothing later
    # forward tie: lowest rid wins — craft an equal-time future pair
    spark = left.sparkSession
    l2 = spark.createDataFrame([(9, 30, _ts("2024-02-10 00:00:00"))], "event_id long, k long, t timestamp")
    by_id2 = _run(l2, right, direction="forward")
    assert by_id2[9]["asof_rid"] == 201  # 201/202 tie at 02-20 → lowest


def test_forward_tolerance(frames):
    left, right = frames
    l2 = frames[0].sparkSession.createDataFrame(
        [(9, 30, _ts("2024-02-10 00:00:00"))], "event_id long, k long, t timestamp"
    )
    by_id = _run(l2, right, direction="forward", tolerance="5 days")
    assert by_id[9]["asof_rid"] is None  # match at 02-20 is 10 days out


def test_bad_direction_rejected(frames):
    left, right = frames
    with pytest.raises(ValueError, match="direction"):
        _run(left, right, direction="sideways")


def test_output_prefix_collision_guard(frames):
    # a left column literally named like an OUTPUT column (prefix+payload)
    # must be rejected, not silently duplicated (ADVICE r8)
    left, right = frames
    with pytest.raises(ValueError, match="asof_rid"):
        asof_join(
            left.withColumn("asof_rid", left.event_id),
            right,
            left_on="k",
            right_on="k",
            left_time="t",
            right_time="rt",
            right_tie="rid",
            payload_cols=("rid",),
        )


# ---------------------------------------------- hot-key split valve (r9)


def _norm(df):
    return sorted(
        tuple("null" if v is None else str(v) for v in row) for row in df.collect()
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("strict", [False, True])
@pytest.mark.parametrize("tolerance", [None, "36 hours"])
def test_split_matches_unsplit(spark, frames, direction, strict, tolerance):
    """The time-bucket valve must be bit-identical to the unsplit form
    in every direction/strict/tolerance combination, at bucket widths
    that cut the fixture mid-timeline, per-row, and not at all."""
    left, right = frames
    kw = dict(
        left_on="k", right_on="k", left_time="t", right_time="rt",
        right_tie="rid", payload_cols=("rid", "val"),
        direction=direction, strict=strict, tolerance=tolerance,
    )
    want = _norm(asof_join(left, right, **kw))
    day_us = 86_400_000_000
    for width in (3 * day_us, 1_000_000, 400 * day_us):
        got = _norm(asof_join(left, right, split_bucket_us=width, **kw))
        assert got == want, (direction, strict, tolerance, width)


def test_split_matches_unsplit_randomized(spark):
    """Dense randomized timeline (equal times, boundary collisions,
    keys with only-left / only-right buckets) — split ≡ unsplit."""
    from pyspark.sql import functions as F

    left = spark.range(0, 600).select(
        F.col("id").alias("event_id"),
        (F.xxhash64("id", F.lit(3)) % 5).alias("k"),
        F.timestamp_micros(
            (F.abs(F.xxhash64("id", F.lit(4))) % 100) * 250_000
        ).alias("t"),
    )
    right = spark.range(0, 200).select(
        F.col("id").alias("rid"),
        (F.xxhash64("id", F.lit(5)) % 5).alias("k"),
        F.timestamp_micros(
            (F.abs(F.xxhash64("id", F.lit(6))) % 100) * 250_000
        ).alias("rt"),
        (F.col("id") % 7).cast("double").alias("val"),
    )
    for direction in ("backward", "forward"):
        kw = dict(
            left_on="k", right_on="k", left_time="t", right_time="rt",
            right_tie="rid", payload_cols=("rid", "val"), direction=direction,
        )
        want = _norm(asof_join(left, right, **kw))
        for width in (250_000, 1_000_000, 7_250_000):
            got = _norm(asof_join(left, right, split_bucket_us=width, **kw))
            assert got == want, (direction, width)
