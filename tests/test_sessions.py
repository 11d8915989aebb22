"""Gap sessionization: batch/streaming agreement and state semantics.

The batch form is oracle-checked by test_correctness
(gap_sessions_stats); here the streaming applyInPandasWithState form
is driven through a real micro-batched stream and compared to the
batch operator on the same data.
"""

from __future__ import annotations

import datetime as dt
import time

import pytest

from clickhouse_realtime_analytics_demo_spark.streaming.sessions import (
    gap_sessions,
    streaming_gap_sessions,
)

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _drain(q, cond, timeout: float = 90.0) -> None:
    """Run a stateful streaming query until ``cond()`` holds or the
    first micro-batch containing all available input has committed,
    then stop it. A stateful query with a pending processing-time
    timeout never self-terminates (the timer IS pending work), so
    availableNow/processAllAvailable would block — stop explicitly.
    """
    deadline = time.time() + timeout
    while time.time() < deadline:
        if cond():
            break
        p = q.lastProgress
        if p and p["numInputRows"] == 0 and p["batchId"] > 0:
            break  # an empty batch committed: all input was processed
        time.sleep(0.25)
    q.stop()
    q.awaitTermination(30)


def _mins(m: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=m)


@pytest.fixture(scope="module")
def event_rows():
    # user 1: two sessions (gap of 60 min between minute 10 and 70);
    # the second session stays open. user 2: one open session.
    return [
        (1, _mins(0)),
        (1, _mins(10)),
        (1, _mins(70)),
        (1, _mins(75)),
        (2, _mins(5)),
    ]


def test_batch_gap_sessions(spark, event_rows):
    df = spark.createDataFrame(event_rows, "user_id long, ts timestamp")
    out = {
        (r.user_id, r.session_id): (r.session_start, r.session_end, r.n_events)
        for r in gap_sessions(df, gap_minutes=30).collect()
    }
    assert out[(1, 0)] == (_mins(0), _mins(10), 2)
    assert out[(1, 1)] == (_mins(70), _mins(75), 2)
    assert out[(2, 0)] == (_mins(5), _mins(5), 1)


def test_streaming_matches_batch_closed_sessions(spark, event_rows, tmp_path):
    src = str(tmp_path / "stream_src")
    df = spark.createDataFrame(event_rows, "user_id long, ts timestamp")
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    closed: list = []

    q = (
        streaming_gap_sessions(stream, gap_minutes=30)
        .writeStream.outputMode("update")
        .foreachBatch(lambda b, _id: closed.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    _drain(q, lambda: len(closed) >= 1)

    # only user 1's first session is closed by a gap inside the data;
    # open sessions wait for the processing-time timeout (not yet
    # fired) — bounded-state semantics, not data loss.
    got = {(r.user_id): (r.session_start, r.session_end, r.n_events, r.closed_by) for r in closed}
    assert got == {1: (_mins(0), _mins(10), 2, "gap")}


def test_streaming_multi_batch_state_carryover(spark, tmp_path):
    """An open session from batch 1 must merge with batch 2's events
    (state carries across micro-batches) and close on a later gap."""
    src = tmp_path / "stream_src2"
    src.mkdir()
    b1 = spark.createDataFrame([(1, _mins(0)), (1, _mins(5))], "user_id long, ts timestamp")
    b2 = spark.createDataFrame([(1, _mins(20)), (1, _mins(90))], "user_id long, ts timestamp")
    closed: list = []

    def run_once(expect_rows: int) -> None:
        stream = spark.readStream.schema("user_id long, ts timestamp").parquet(str(src))
        q = (
            streaming_gap_sessions(stream, gap_minutes=30)
            .writeStream.outputMode("update")
            .foreachBatch(lambda b, _id: closed.extend(b.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .start()
        )
        _drain(q, lambda: len(closed) >= expect_rows)

    b1.coalesce(1).write.mode("append").parquet(str(src))
    run_once(0)
    assert closed == []  # session still open, held in state
    b2.coalesce(1).write.mode("append").parquet(str(src))
    run_once(1)
    assert [(r.user_id, r.session_start, r.session_end, r.n_events, r.closed_by) for r in closed] == [
        (1, _mins(0), _mins(20), 3, "gap")
    ]
