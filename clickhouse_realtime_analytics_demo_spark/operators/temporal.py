"""As-of (point-in-time) join — ClickHouse ``ASOF JOIN`` analog.

ClickHouse joins each left row to the single right row with the
largest ``right_time <= left_time`` per key (``ASOF JOIN ... USING
(key, time)``). Spark has no built-in as-of join, so this implements
the classic scalable formulation: UNION both sides tagged with a
side marker, sort each key's timeline once with a *partitioned*
window, and carry the most recent right-side payload forward with
``last(..., ignorenulls=True)``.

Why this shape at 100 TB:

- ONE shuffle, on the join key — the same exchange any equi-join
  would pay. No range-explosion join (``l.key = r.key AND r.t <=
  l.t`` as a raw join predicate degenerates to per-key Cartesian
  blow-up), no per-row driver logic.
- The window is partitioned by key (never the "No Partition Defined"
  scale-killer); cost per key is one sort of that key's combined
  timeline, which is the information-theoretic floor for as-of
  semantics.
- Payload rides in ONE struct column, so a right row whose payload
  legitimately contains NULL fields is still carried atomically
  (per-column ``last(ignorenulls)`` would mix attributes from
  different right rows).

Skew note: a pathologically hot key serializes its own timeline into
one task, like any per-key sequence operator (sessionization has the
same floor) — measured (SCALEPROBE "As-of hot key"): a planted
1-key timeline is 2.6×/3.2× slower than uniform at 4M/8M rows.
``split_bucket_us`` is the valve: partition each key's timeline into
fixed time buckets, carry within (key, bucket) in parallel, and stitch
buckets with a per-bucket final-state spine (one row per non-empty
(key, bucket)) — results are bit-identical to the unsplit form for
every direction/strict/tolerance combination
(tests/test_asof.py::test_split_matches_unsplit).

Determinism: ties at equal ``right_time`` within a key are broken by
``right_tie`` (highest wins) — explicitly, because the driver's
value-hash comparison needs ONE answer. ClickHouse leaves the
equal-time winner to part order; we pin it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.session import spread_partitions

__all__ = ["asof_join"]

# Engine-owned spread target for the union-carry window (VERDICT r14
# #1, SCALEPROBE sf6 rung): the timeline sort is byte-LIGHT but
# memory-HEAVY — compressed scan bytes expand ~50x into the sort's
# row buffers, so AQE's byte-based coalescing (64 MB advisory;
# parallelismFirst floors at core count) squeezes the window exchange
# back to ~cores partitions and the per-key sort spills past ~sf3
# (measured: 8.5x wall for 6x data at 32 fixed partitions; the swept
# optimum 256 ≈ 0.75 MB of scan bytes per partition restored 5.2x).
# An explicit keyed repartition at this density is user-specified —
# AQE never coalesces it — and satisfies the window's required
# distribution, so no second exchange appears.
ASOF_SPREAD_SOURCE_BYTES = 768 * 1024


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    right_tie: str,
    payload_cols: Sequence[str],
    prefix: str = "asof_",
    strict: bool = False,
    tolerance: str | None = None,
    direction: str = "backward",
    split_bucket_us: int | None = None,
) -> DataFrame:
    """Left as-of join: attach, to every ``left`` row, the most recent
    ``right`` row of the same key with ``right_time <= left_time``
    (``<`` when ``strict``), or NULLs when none exists. With
    ``direction="forward"`` the nearest FUTURE right row instead
    (``right_time >= left_time``, ``>`` when strict) — ClickHouse
    ASOF's ``>=``/``>`` inequality forms.

    Output: every ``left`` column, then ``{prefix}{right_time}`` and
    ``{prefix}{c}`` for each payload column. ``right_tie`` must be
    unique per (key, time) group (e.g. a primary key); the tie nearer
    the left row wins equal-time ties (highest backward, lowest
    forward). ``tolerance`` (an SQL interval literal body like
    ``'7 days'``) nulls out matches farther than that from the left
    time, mirroring pandas ``merge_asof``.

    ``split_bucket_us`` is the hot-key valve (module docstring): the
    per-key timeline is cut into fixed time buckets of that many
    microseconds, carried in parallel per (key, bucket), and stitched
    through a per-bucket final-state spine. Identical results; one
    extra (small) spine window and join. Size it so one bucket of the
    hottest key fits a task (e.g. an hour of a key that logs ~10⁶
    events/day); buckets-per-key stays bounded because retention
    bounds the time range.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    for c in left.columns:
        if c.startswith("_asof_"):
            raise ValueError(f"left column {c!r} collides with internal _asof_ prefix")
    out_names = [right_time, *payload_cols]
    for c in out_names:
        if prefix + c in left.columns:
            raise ValueError(
                f"output column {prefix + c!r} collides with an existing left "
                f"column; pass a different prefix="
            )

    # Side marker: inclusive semantics sort right rows BEFORE left
    # rows at equal time in SCAN ORDER (an order placed at the event
    # instant is visible); strict sorts them after (invisible). The
    # scan runs time-ascending for backward, time-descending for
    # forward — either way the carried ``last`` is the nearest
    # eligible right row.
    right_side = 2 if strict else 0
    r = right.select(
        F.col(right_on).alias("_asof_k"),
        F.col(right_time).alias("_asof_t"),
        F.lit(right_side).alias("_asof_side"),
        F.col(right_tie).alias("_asof_tie"),
        F.struct(*[F.col(c) for c in out_names]).alias("_asof_payload"),
    )
    l_rows = left.select(
        F.col(left_on).alias("_asof_k"),
        F.col(left_time).alias("_asof_t"),
        F.lit(1).alias("_asof_side"),
        F.struct(*left.columns).alias("_asof_row"),
    )
    u = l_rows.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        order = [F.col("_asof_t").asc(), F.col("_asof_side").asc(), F.col("_asof_tie").asc()]
    else:
        order = [F.col("_asof_t").desc(), F.col("_asof_side").asc(), F.col("_asof_tie").desc()]

    if split_bucket_us is None:
        # data-proportional spread (constant above): the floor keeps
        # small inputs on today's core-count plan; big inputs scale
        # the sort's partition count with their bytes instead of
        # spilling at a fixed count
        u = u.repartition(
            spread_partitions(u, target_bytes=ASOF_SPREAD_SOURCE_BYTES), "_asof_k"
        )
        w = (
            Window.partitionBy("_asof_k")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = u.withColumn(
            "_asof_hit", F.last("_asof_payload", ignorenulls=True).over(w)
        )
    else:
        # Hot-key valve. Floor-divide time into buckets (pmod form:
        # `div` truncates toward zero, wrong for pre-epoch times), then:
        #  1. carry within each (key, bucket) — parallel across buckets;
        #  2. per-bucket final state = the right row a LATER-in-scan
        #     bucket would see as most recent (max_by (t, tie) in scan
        #     order; buckets partition time, so cross-bucket carries
        #     never involve equal-time/strictness subtleties);
        #  3. spine of ALL (key, bucket) pairs present (a bucket with
        #     only left rows still needs the carry), window over the
        #     per-key bucket sequence — |buckets-per-key| rows, tiny —
        #     takes the last non-null state STRICTLY BEFORE each bucket;
        #  4. join the spine back (AQE broadcasts it; the big side is
        #     already hash-partitioned on (key, bucket) by the window)
        #     and coalesce in-bucket hit with the carried-in state.
        wus = int(split_bucket_us)
        bucket = F.expr(
            f"(unix_micros(_asof_t) - pmod(unix_micros(_asof_t), {wus})) div {wus}"
        )
        u = u.withColumn("_asof_b", bucket)
        scan_asc = direction == "backward"
        w_in = (
            Window.partitionBy("_asof_k", "_asof_b")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        state_of = F.max_by if scan_asc else F.min_by
        states = (
            u.filter(F.col("_asof_side") != 1)
            .groupBy("_asof_k", "_asof_b")
            .agg(
                state_of(
                    "_asof_payload", F.struct(F.col("_asof_t"), F.col("_asof_tie"))
                ).alias("_asof_bstate")
            )
        )
        spine = (
            u.select("_asof_k", "_asof_b")
            .distinct()
            .join(states, ["_asof_k", "_asof_b"], "left")
        )
        w_b = (
            Window.partitionBy("_asof_k")
            .orderBy(F.col("_asof_b").asc() if scan_asc else F.col("_asof_b").desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        spine = spine.select(
            "_asof_k",
            "_asof_b",
            F.last("_asof_bstate", ignorenulls=True).over(w_b).alias("_asof_prev"),
        )
        carried = (
            u.withColumn(
                "_asof_inhit", F.last("_asof_payload", ignorenulls=True).over(w_in)
            )
            .join(spine, ["_asof_k", "_asof_b"], "left")
            .withColumn("_asof_hit", F.coalesce("_asof_inhit", "_asof_prev"))
        )
    if tolerance is not None:
        hit_t = F.col(f"_asof_hit.{right_time}")
        bound = F.expr(f"INTERVAL {tolerance}")
        tol_ok = (
            hit_t >= F.col("_asof_t") - bound
            if direction == "backward"
            else hit_t <= F.col("_asof_t") + bound
        )
        carried = carried.withColumn("_asof_hit", F.when(tol_ok, F.col("_asof_hit")))

    return carried.filter(F.col("_asof_side") == 1).select(
        F.col("_asof_row.*"),
        *[F.col(f"_asof_hit.{c}").alias(prefix + c) for c in out_names],
    )
