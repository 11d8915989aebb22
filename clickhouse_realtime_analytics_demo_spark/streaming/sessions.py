"""Gap-based sessionization — batch and custom-stateful-streaming forms.

The reference sessionizes with fixed 30-minute buckets
(examples/sample_queries.sql:414-438, ``toStartOfInterval``), which
splits a session spanning a bucket edge and merges unrelated visits
inside one bucket. Fixed buckets are kept for parity
(queries ``session_stats``); this module adds true *gap* sessions
(a session ends after ``gap`` minutes of inactivity):

- ``gap_sessions``: batch form — lag + conditional cumsum over a
  per-user window. One shuffle on user_id; fully expressible in SQL,
  so it is oracle-checked like any other query.
- ``StreamingSessionizer``: the streaming form the reference cannot
  express at all — ``applyInPandasWithState`` keeps one open session
  per user, merges each micro-batch into it, emits a session row when
  the processing-time timeout fires after the gap elapses. State is
  O(active users); the timeout bounds it — the custom-stateful-
  operator pattern (GroupState + timeouts) from the public Spark
  Structured Streaming API.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:
    import pandas as pd

# ------------------------------------------------------------- batch form


def gap_sessions(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user gap sessions: (user_id, session_id, session_start,
    session_end, n_events). A new session starts when the gap since the
    user's previous event exceeds ``gap_minutes``.

    Plan: single shuffle on user_id serves both window passes and the
    final group-by (same partitioning, no extra exchange).
    """
    # parquet written without timezone info reads as TIMESTAMP_NTZ
    # (Spark's inferTimestampNTZ default); unix_micros requires ltz.
    # Session tz is UTC, so the cast is value-preserving and matches
    # the SQL oracle's naive-timestamp arithmetic.
    if isinstance(events.schema[ts_col].dataType, T.TimestampNTZType):
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # integer microseconds (unix_micros), not seconds or doubles:
    # exact, portable to the SQL oracle (epoch_us), no float rounding.
    gap_us = gap_minutes * 60 * 1_000_000
    new_session = (
        F.unix_micros(F.col(ts_col)) - F.lag(F.unix_micros(F.col(ts_col))).over(w) > gap_us
    )
    with_ids = events.withColumn(
        "session_id", F.sum(F.when(new_session, 1).otherwise(0)).over(w)
    )
    return (
        with_ids.groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )


# --------------------------------------------------------- streaming form

SESSION_STATE = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed_by", T.StringType()),  # gap | timeout
    ]
)


def _session_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple,
        batches: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "closed_by": ["timeout"],
                }
            )
            return

        ts_us: list[int] = []
        for pdf in batches:
            ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
        if not ts_us:
            if state.exists:
                state.setTimeoutDuration(gap_minutes * 60 * 1000)
            return
        ts_us.sort()
        closed: list[tuple[int, int, int]] = []
        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us = end_us = ts_us[0]
            n = 0
        for t in ts_us:
            if n > 0 and t - end_us > gap_us:
                closed.append((start_us, end_us, n))
                start_us, n = t, 0
            end_us = max(end_us, t)
            n += 1
        state.update((start_us, end_us, n))
        # processing-time timeout: close the open session after the gap
        # elapses with no new data for this user.
        state.setTimeoutDuration(gap_minutes * 60 * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                    "closed_by": ["gap"] * len(closed),
                }
            )

    return fn


def streaming_gap_sessions(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Continuous gap-sessionization of an event stream.

    Emits one row per CLOSED session (update mode). State per user is
    one open-session triple; the processing-time timeout closes idle
    sessions so state size is bounded by *active* users, not all users
    ever seen — the knob that keeps this viable on an unbounded stream.
    """
    return (
        events_stream.select(F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes),
            outputStructType=SESSION_OUT,
            stateStructType=SESSION_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
