"""windowFunnel — ClickHouse's ordered multi-stage conversion
aggregate (``windowFunnel(window)(ts, cond1, cond2, …)``), the
flagship funnel primitive of the reference engine's ecosystem.

Semantics pinned here (= ClickHouse's ``strict_increase`` mode): per
user, the maximum chain depth d such that events matching
cond1 < cond2 < … < cond_d exist with strictly increasing timestamps
and ``t_d <= t_1 + window``. Strict increase is chosen because
equal-timestamp chains are order-ambiguous — the driver's value-hash
gate needs ONE answer (documented divergence from ClickHouse's
*default* mode, which admits equal timestamps).

Distributed shape — one pass, not per-anchor scans:

1. ONE user-partitioned window with a micros RANGE frame
   ``(t+1, t+window]`` computes, for EVERY event row, the minimum
   next-stage timestamp of each stage (k−1 conditional ``min``s over
   the same frame — Spark plans a single WindowExec).
2. The chain is then stitched with k−2 equi-joins on
   ``(user, exact stage-i timestamp)`` — NOT a range join, so no
   per-key explosion; both sides shuffle on the same user-led key.
3. Validity of stage i ≥ 2 against the ANCHOR window uses the
   superset-min argument: the stage-i candidate set anchored at t₁,
   ``(t_{i-1}, t₁+W]``, is a subset of the frame's
   ``(t_{i-1}, t_{i-1}+W]`` (since t_{i-1} ≥ t₁), so
   ``frame_min ≤ t₁+W  ⇔  a valid stage-i event exists`` — the frame
   min is valid iff any subset element is. The DuckDB oracle states
   the subset condition directly, so agreement also proves this
   argument.

Scale: every shuffle is keyed by user (the same key as sessions/RFM);
no unpartitioned window, no range-explosion join, no driver loops. A
pathologically hot user serializes its own timeline — the same floor
as any per-key sequence operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["window_funnel", "funnel_levels"]


def window_funnel(
    events: DataFrame,
    *,
    stages: Sequence[Column],
    window_us: int,
    user_col: str = "user_id",
    time_col: str = "ts",
) -> DataFrame:
    """Per-user max funnel depth: ``(user, depth)`` with depth in
    [1, len(stages)]; users with no stage-1 event are absent."""
    k = len(stages)
    if k < 2:
        raise ValueError("windowFunnel needs at least 2 stages")
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.unix_micros(F.col(time_col)).alias("_t"),
        *[c.cast("boolean").alias(f"_is{i}") for i, c in enumerate(stages)],
    )
    frame = (
        Window.partitionBy("_u").orderBy("_t").rangeBetween(1, int(window_us))
    )
    # r_i on every row: min timestamp of a stage-i event strictly
    # after this row, within one window length of THIS ROW
    mins = [
        F.min(F.when(F.col(f"_is{i}"), F.col("_t"))).over(frame).alias(f"_r{i}")
        for i in range(1, k)
    ]
    rows = ev.select("_u", "_t", *[F.col(f"_is{i}") for i in range(k)], *mins)

    anchors = rows.filter(F.col("_is0")).select(
        F.col("_u"), F.col("_t").alias("_vt"), F.col("_r1").alias("_t1")
    )
    chain = anchors
    for i in range(2, k):
        # stage-(i-1) rows carry the frame-min for stage i; dedup by
        # (user, t) — equal-time duplicates have identical mins
        stage_rows = (
            rows.filter(F.col(f"_is{i-1}"))
            .select("_u", F.col("_t").alias(f"_t{i-1}"), F.col(f"_r{i}"))
            .distinct()
        )
        chain = chain.join(stage_rows, ["_u", f"_t{i-1}"], "left").withColumn(
            f"_t{i}",
            F.when(
                F.col(f"_r{i}") <= F.col("_vt") + F.lit(int(window_us)),
                F.col(f"_r{i}"),
            ),
        )
    depth = F.lit(1)
    for i in range(1, k):
        depth = depth + F.when(F.col(f"_t{i}").isNotNull(), 1).otherwise(0)
    return (
        chain.withColumn("_depth", depth)
        .groupBy(F.col("_u").alias("user_id"))
        .agg(F.max("_depth").alias("depth"))
    )


def funnel_levels(per_user_depth: DataFrame, k: int) -> DataFrame:
    """Cumulative funnel report: ``(level, users)`` = how many users
    reached at least each level 1..k."""
    levels = F.array(*[F.lit(i) for i in range(1, k + 1)])
    return (
        per_user_depth.select(
            "depth", F.explode(F.filter(levels, lambda lv: lv <= F.col("depth"))).alias("level")
        )
        .groupBy("level")
        .agg(F.count("*").alias("users"))
    )


def sequence_match(
    events: DataFrame,
    *,
    stages: Sequence[Column],
    user_col: str = "user_id",
    time_col: str = "ts",
) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1).*(?2).*(?3)')(ts, c1, c2, c3)``
    analog — the UNwindowed sibling of :func:`window_funnel`: does an
    ordered chain t1 < t2 < … < tk of stage events exist anywhere in
    the user's history? Returns ``(user, depth)`` where depth is the
    longest matched prefix (users with no stage-1 event are absent),
    so :func:`funnel_levels` reports it the same way.

    Existence is decided by the GREEDY earliest chain: taking the
    earliest stage-1 time, then the earliest later stage-2 time, and
    so on, never forecloses a longer match (any valid chain's stage-i
    time is ≥ the greedy one, so every later stage keeps a superset
    of candidates). Strict increase keeps equal-timestamp chains
    unambiguous — the same determinism choice as window_funnel.

    Distributed shape: k chained ``min(CASE)`` window aggregates over
    one unordered user partition — ONE exchange on the user key, no
    per-partition sort (unbounded frames need no ordering), no
    collect_list arrays, no joins. The follow-up groupBy reuses the
    window's hash partitioning, so the whole operator is
    single-shuffle regardless of k.
    """
    k = len(stages)
    if k < 2:
        raise ValueError("sequenceMatch needs at least 2 stages")
    w = Window.partitionBy("_u")
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.unix_micros(F.col(time_col)).alias("_t"),
        *[c.cast("boolean").alias(f"_is{i}") for i, c in enumerate(stages)],
    )
    cur = ev.withColumn("_m0", F.min(F.when(F.col("_is0"), F.col("_t"))).over(w))
    for i in range(1, k):
        cur = cur.withColumn(
            f"_m{i}",
            F.min(
                F.when(
                    F.col(f"_is{i}") & (F.col("_t") > F.col(f"_m{i-1}")), F.col("_t")
                )
            ).over(w),
        )
    depth = F.lit(0)
    for i in range(k):
        depth = depth + F.when(F.col(f"_m{i}").isNotNull(), 1).otherwise(0)
    # _m{i} is null whenever _m{i-1} is (the CASE guard), so depth
    # counts exactly the matched prefix length.
    return (
        cur.withColumn("_depth", depth)
        .filter(F.col("_m0").isNotNull())
        .groupBy(F.col("_u").alias("user_id"))
        .agg(F.max("_depth").alias("depth"))
    )
