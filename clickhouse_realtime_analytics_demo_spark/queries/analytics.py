"""Complex analytics mirroring the reference's refreshable MVs and
live-dashboard queries (SURVEY.md §2.3 J3-J9, §2.5, §2.9 ST4/ST5):
time bucketing, sessionization, cohort retention, RFM, KPI snapshot.

These run as scheduled batch jobs in the engine (see
``streaming.refresh``) exactly like the reference's ``REFRESH EVERY
1 HOUR`` MVs (05-add-refreshable-mvs.sql.disabled); here each is also
exposed as a standalone query for the correctness harness.
"""

from __future__ import annotations  # noqa: I001

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.catalog import table
from clickhouse_realtime_analytics_demo_spark.operators.ranking import (
    exact_global_ranks,
    ntile_from_rank,
)
from clickhouse_realtime_analytics_demo_spark.queries._det import money_sum
from clickhouse_realtime_analytics_demo_spark.queries.registry import register

# Fixed "now" anchor just past the events table's max ts (2024-01-30)
# — the reference's now()-relative queries are parameterized on a
# frozen clock for determinism (SURVEY §7 hard-parts).
ANCHOR_DATE = "2024-01-31"


@register(
    "hourly_event_matrix",
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date,
           CAST(HOUR(ts) AS INTEGER) AS event_hour,
           event_type,
           COUNT(*) AS events,
           COUNT(DISTINCT user_id) AS unique_users
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY event_date, event_hour, event_type
    """,
)
def hourly_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key hour×type matrix — the mv_hourly_events shape (A7:
    01-create-tables.sql:136-152 GROUP BY date, hour, type, …).

    toDate/toHour → to_date/hour (§2.8 function map).
    """
    events = table(spark, sf_dir, "events")
    return (
        events.filter(F.col("ts") >= F.lit("2024-01-20 00:00:00").cast("timestamp"))
        .groupBy(
            F.to_date("ts").alias("event_date"),
            F.hour("ts").alias("event_hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("events"),
            F.countDistinct("user_id").alias("unique_users"),
        )
        .orderBy("event_date", "event_hour", "event_type")
    )


@register(
    "minute_timeline",
    oracle="""
    SELECT date_trunc('minute', ts) AS minute,
           COUNT(*) AS events
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-30 20:00:00'
    GROUP BY 1
    ORDER BY minute
    """,
)
def minute_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-minute live timeline (ST4: app_interactive.py:224-234
    ``toStartOfMinute`` buckets over the recent window)."""
    events = table(spark, sf_dir, "events")
    return (
        events.filter(F.col("ts") >= F.lit("2024-01-30 20:00:00").cast("timestamp"))
        .groupBy(F.date_trunc("minute", "ts").alias("minute"))
        .agg(F.count("*").alias("events"))
        .orderBy("minute")
    )


@register(
    "session_stats",
    oracle="""
    SELECT user_id,
           CAST(to_timestamp(FLOOR(epoch(ts) / 1800) * 1800) AS TIMESTAMP) AS session_start,
           COUNT(*) AS events,
           COUNT(DISTINCT event_type) AS distinct_event_types,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
    FROM events
    GROUP BY 1, 2
    HAVING COUNT(*) >= 3
    ORDER BY user_id, session_start
    """,
)
def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-interval sessionization (ST5: sample_queries.sql:414-438
    ``toStartOfInterval(ts, INTERVAL 30 MINUTE)`` per user).

    The reference uses fixed 30-min buckets, NOT gap-based sessions —
    we copy that exactly (epoch//1800). Gap sessions exist separately
    in ``streaming.sessions`` via session_window.
    """
    events = table(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(F.floor(F.unix_timestamp("ts") / 1800) * 1800)
    return (
        events.groupBy("user_id", bucket.alias("session_start"))
        .agg(
            F.count("*").alias("events"),
            F.countDistinct("event_type").alias("distinct_event_types"),
            money_sum(F.col("value")).alias("session_value"),
        )
        .filter(F.col("events") >= 3)
        .orderBy("user_id", "session_start")
    )


@register(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events
    )
    SELECT f.cohort_day AS cohort_day,
           CAST(a.active_day - f.cohort_day AS INTEGER) AS day_offset,
           COUNT(DISTINCT a.user_id) AS active_users
    FROM activity a
    JOIN firsts f ON a.user_id = f.user_id
    GROUP BY 1, 2
    ORDER BY cohort_day, day_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (05-add-refreshable-mvs.sql.disabled:
    107-147: first-activity cohort × dateDiff offset × distinct users).

    Scale: both sides pre-aggregate to one row per (user, day) before
    the join; the join key is user_id (high cardinality, well
    distributed).
    """
    events = table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    activity = events.select("user_id", F.to_date("ts").alias("active_day")).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("active_day", "cohort_day").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "user_rfm",
    oracle=f"""
    WITH base AS (
        SELECT user_id,
               CAST(DATE '{ANCHOR_DATE}' - MAX(CAST(ts AS DATE)) AS BIGINT) AS recency_days,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        FROM events
        GROUP BY user_id
    )
    SELECT user_id, recency_days, frequency, monetary,
           CAST(NTILE(5) OVER (ORDER BY recency_days, user_id) AS INTEGER) AS r_score,
           CAST(NTILE(5) OVER (ORDER BY frequency DESC, user_id) AS INTEGER) AS f_score,
           CAST(NTILE(5) OVER (ORDER BY monetary DESC, user_id) AS INTEGER) AS m_score
    FROM base
    ORDER BY user_id
    """,
)
def user_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM scoring (05-add-refreshable-mvs.sql.disabled:55-99: recency
    via dateDiff from a fixed anchor, frequency, monetary, quintile
    scores; each ORDER BY tie-breaks on user_id).

    Scale: the reference's ``ntile(5) OVER (ORDER BY ...)`` would be
    three unpartitioned windows — a single-task sort of every user,
    three times (VERDICT round 2 Performance #1). Here the three
    orderings are melted into (kind, key) rows and ranked via
    ``operators/ranking.exact_global_ranks`` (order-aligned
    approx-percentile buckets + partitioned row_number + exact
    offsets), then NTILE arithmetic maps ranks to quintiles —
    bit-identical output, no unpartitioned WindowExec
    (tests/test_rfm_scale.py asserts the plan).
    """
    events = table(spark, sf_dir, "events")
    base = events.groupBy("user_id").agg(
        F.datediff(F.lit(ANCHOR_DATE).cast("date"), F.max(F.to_date("ts")))
        .cast("bigint")
        .alias("recency_days"),
        F.count("*").alias("frequency"),
        money_sum(F.col("value")).alias("monetary"),
    )
    melted = base.selectExpr(
        "user_id AS uid",
        "stack(3, 'r', CAST(recency_days AS DOUBLE),"
        "         'f', -CAST(frequency AS DOUBLE),"
        "         'm', -monetary) AS (kind, k)",
    )
    ranked = exact_global_ranks(melted)
    bucket = ntile_from_rank(F.col("rank"), F.col("n"), 5)
    # R/F/M values are recovered from the melted sort keys (exact
    # inverses: sign flip and lossless casts), so no join back to the
    # base aggregate — one less branch re-scanning events
    kind, k = F.col("kind"), F.col("k")
    return (
        ranked.groupBy("uid")
        .agg(
            F.max(F.when(kind == "r", k)).cast("bigint").alias("recency_days"),
            F.max(F.when(kind == "f", -k)).cast("long").alias("frequency"),
            F.max(F.when(kind == "m", -k)).alias("monetary"),
            F.max(F.when(kind == "r", bucket)).alias("r_score"),
            F.max(F.when(kind == "f", bucket)).alias("f_score"),
            F.max(F.when(kind == "m", bucket)).alias("m_score"),
        )
        .withColumnRenamed("uid", "user_id")
        .orderBy("user_id")
    )


@register(
    "kpi_snapshot",
    oracle="""
    SELECT (SELECT COUNT(*) FROM events) AS total_events,
           (SELECT COUNT(DISTINCT user_id) FROM events) AS active_users,
           (SELECT COUNT(*) FROM events WHERE event_type = 'purchase') AS purchases,
           (SELECT CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
            FROM events WHERE event_type = 'purchase') AS purchase_value,
           (SELECT COUNT(*) FROM orders) AS total_orders,
           (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            FROM orders WHERE o_orderstatus = 'F') AS finished_revenue,
           (SELECT CAST(COUNT(*) AS DOUBLE) FROM events WHERE event_type = 'purchase')
             / (SELECT CAST(COUNT(*) AS DOUBLE) FROM events WHERE event_type = 'view')
             AS view_to_purchase_rate
    """,
)
def kpi_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-KPI snapshot row of independent scalar metrics (J9:
    05-add-refreshable-mvs.sql.disabled:198-223 — 14 scalar subqueries
    into one ReplacingMergeTree row).

    Spark: conditional aggregation collapses the event-side subqueries
    into ONE scan of events + one scan of orders, crossJoined — far
    fewer passes than the reference's 14 independent subqueries.
    """
    events = table(spark, sf_dir, "events")
    orders = table(spark, sf_dir, "orders")
    is_purchase = F.col("event_type") == "purchase"
    ev = events.agg(
        F.count("*").alias("total_events"),
        F.countDistinct("user_id").alias("active_users"),
        F.count_if(is_purchase).alias("purchases"),
        F.sum(F.when(is_purchase, F.col("value").cast("decimal(18,2)")))
        .cast("double")
        .alias("purchase_value"),
        (
            F.count_if(is_purchase).cast("double")
            / F.count_if(F.col("event_type") == "view").cast("double")
        ).alias("view_to_purchase_rate"),
    )
    od = orders.agg(
        F.count("*").alias("total_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice").cast("decimal(18,2)")))
        .cast("double")
        .alias("finished_revenue"),
    )
    return ev.crossJoin(od).select(
        "total_events",
        "active_users",
        "purchases",
        "purchase_value",
        "total_orders",
        "finished_revenue",
        "view_to_purchase_rate",
    )


@register(
    "monthly_order_trend",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(YEAR(o_orderdate) * 100 + MONTH(o_orderdate) AS INTEGER) AS yyyymm,
           COUNT(*) AS orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2
    ORDER BY order_month
    """,
)
def monthly_order_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month bucketing + toYYYYMM partition-key math (§2.8:
    toStartOfMonth 05:115, toYYYYMM 01-create-tables.sql:50; monthly
    revenue app.py:178-195). The yyyymm int mirrors the reference's
    partition expression; on a partitioned lake this predicate prunes
    to 24 monthly partitions."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(
            F.to_date(F.date_trunc("month", "o_orderdate")).alias("order_month"),
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("yyyymm"),
        )
        .agg(F.count("*").alias("orders"), money_sum(F.col("o_totalprice")).alias("revenue"))
        .orderBy("order_month")
    )


@register(
    "weekly_active_users",
    oracle="""
    SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
           COUNT(DISTINCT user_id) AS weekly_users,
           COUNT(*) AS events
    FROM events
    GROUP BY 1
    ORDER BY week_start
    """,
)
def weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-week bucketing (§2.8: ``toMonday`` 05:116,124 = Spark/DuckDB
    ``date_trunc('week', …)``, both Monday-start)."""
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(F.to_date(F.date_trunc("week", "ts")).alias("week_start"))
        .agg(
            F.countDistinct("user_id").alias("weekly_users"),
            F.count("*").alias("events"),
        )
        .orderBy("week_start")
    )


@register(
    "gap_sessions_stats",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                         > 1800 * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    ids AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ),
    sessions AS (
        SELECT user_id, session_id,
               MIN(ts) AS session_start, MAX(ts) AS session_end, COUNT(*) AS n_events
        FROM ids GROUP BY user_id, session_id
    )
    SELECT user_id,
           COUNT(*) AS sessions,
           CAST(SUM(n_events) AS BIGINT) AS events,
           CAST(MAX(n_events) AS BIGINT) AS max_session_events,
           CAST(SUM(epoch_us(session_end) - epoch_us(session_start)) // 1000000 AS BIGINT)
             AS total_session_seconds
    FROM sessions
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def gap_sessions_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True gap-based sessionization (30-min inactivity gap) — the
    upgrade over the reference's fixed 30-min buckets
    (examples/sample_queries.sql:414-438): a session spanning a bucket
    edge stays whole. Batch form of streaming/sessions.py; the
    streaming form is applyInPandasWithState."""
    from clickhouse_realtime_analytics_demo_spark.streaming.sessions import gap_sessions

    events = table(spark, sf_dir, "events")
    s = gap_sessions(events, gap_minutes=30)
    return (
        s.groupBy("user_id")
        .agg(
            F.count("*").alias("sessions"),
            F.sum("n_events").alias("events"),
            F.max("n_events").alias("max_session_events"),
            (
                F.sum(F.unix_micros("session_end") - F.unix_micros("session_start"))
                / F.lit(1_000_000)
            )
            .cast("bigint")
            .alias("total_session_seconds"),
        )
        .orderBy("user_id")
    )


@register(
    "events_asof_order",
    # Independent oracle formulation: instead of the union+window
    # carry, dedup orders per (custkey, orderdate) with the same
    # highest-orderkey tie-break, then LEFT JOIN every event to all
    # at-or-before orders and arg_max by orderdate. Agreement proves
    # the carried window picks exactly the latest-at-or-before row.
    oracle="""
    WITH od AS (
        SELECT o_custkey, o_orderdate,
               MAX(o_orderkey) AS okey,
               ARG_MAX(o_totalprice, o_orderkey) AS oprice
        FROM orders GROUP BY 1, 2
    )
    SELECT e.event_id,
           e.user_id,
           e.ts,
           e.event_type,
           MAX(od.o_orderdate) AS asof_o_orderdate,
           ARG_MAX(od.okey, od.o_orderdate) AS asof_o_orderkey,
           ARG_MAX(od.oprice, od.o_orderdate) AS asof_o_totalprice
    FROM events e
    LEFT JOIN od ON od.o_custkey = e.user_id AND od.o_orderdate <= e.ts
    GROUP BY 1, 2, 3, 4
    ORDER BY event_id
    """,
)
def events_asof_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF JOIN analog (ClickHouse ``ASOF JOIN``; reference engine
    supports it natively — no sample query uses it, but a switching
    user would reach for it on exactly this shape): each behavioral
    event tagged with the user's most recent order at-or-before the
    event instant — the point-in-time feature-lookup every
    leakage-safe training pipeline needs.

    One shuffle on user key, partitioned-window carry
    (operators/temporal.py); equal-time ties pinned to the highest
    orderkey.
    """
    from clickhouse_realtime_analytics_demo_spark.operators.temporal import asof_join

    events = table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    orders = table(spark, sf_dir, "orders")
    return asof_join(
        events,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_tie="o_orderkey",
        payload_cols=("o_orderkey", "o_totalprice"),
    ).orderBy("event_id")


@register(
    "order_value_quantiles",
    # Same pinned nearest-rank definition, independent plan: DuckDB
    # computes rank/count windows directly and probes via a VALUES
    # table; prob cast to DOUBLE so both sides emit IEEE doubles.
    oracle="""
    WITH j AS (
        SELECT c.c_mktsegment AS segment,
               o.o_totalprice AS v,
               row_number() OVER (PARTITION BY c.c_mktsegment
                                  ORDER BY o.o_totalprice, o.o_orderkey) AS rn,
               count(*) OVER (PARTITION BY c.c_mktsegment) AS n
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    )
    SELECT segment, CAST(p AS DOUBLE) AS prob, v AS quantile
    FROM j, (VALUES (0.25), (0.5), (0.75), (0.9), (0.99)) probs(p)
    WHERE rn = CAST(floor(CAST(p AS DOUBLE) * (n - 1)) AS BIGINT) + 1
    ORDER BY segment, prob
    """,
)
def order_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order-value quantiles (p25/p50/p75/p90/p99) per market
    segment — ClickHouse ``quantileExact`` semantics (actual data
    values, rank-selected), distributed as one group-partitioned
    sort (operators/quantiles.py). The sketch path at 100 TB is
    ``percentile_approx`` (already used internally by
    operators/ranking.py and packing.py); exact is the contractual
    twin."""
    from clickhouse_realtime_analytics_demo_spark.operators.quantiles import (
        exact_group_quantiles,
    )

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
    )
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "segment", "o_totalprice", "o_orderkey"
    )
    return exact_group_quantiles(
        joined,
        group_cols=("segment",),
        value_col="o_totalprice",
        tie_col="o_orderkey",
        probs=(0.25, 0.5, 0.75, 0.9, 0.99),
    ).orderBy("segment", "prob")


@register(
    "window_funnel",
    # Independent oracle: per-anchor correlated MINs state the SUBSET
    # windows directly ((t_prev, t_anchor + W] at every stage), while
    # Spark uses one range-frame window pass + the superset-min
    # equivalence — agreement proves both the operator and the
    # argument (operators/funnel.py). epoch_us on both sides; strict
    # timestamp increase pinned.
    oracle="""
    WITH v AS (
        SELECT user_id, epoch_us(ts) AS vt FROM events WHERE event_type = 'view'
    ), c1 AS (
        SELECT v.user_id, v.vt,
               (SELECT MIN(epoch_us(c.ts)) FROM events c
                 WHERE c.user_id = v.user_id AND c.event_type = 'click'
                   AND epoch_us(c.ts) > v.vt
                   AND epoch_us(c.ts) <= v.vt + 14400000000) AS ct
        FROM v
    ), c2 AS (
        SELECT user_id, vt, ct,
               (SELECT MIN(epoch_us(p.ts)) FROM events p
                 WHERE p.user_id = c1.user_id AND p.event_type = 'purchase'
                   AND ct IS NOT NULL
                   AND epoch_us(p.ts) > c1.ct
                   AND epoch_us(p.ts) <= c1.vt + 14400000000) AS pt
        FROM c1
    ), per_user AS (
        SELECT user_id,
               MAX(1 + CASE WHEN ct IS NOT NULL THEN 1 ELSE 0 END
                     + CASE WHEN pt IS NOT NULL THEN 1 ELSE 0 END) AS depth
        FROM c2 GROUP BY user_id
    )
    SELECT l.level, COUNT(*) AS users
    FROM per_user, (VALUES (1), (2), (3)) AS l(level)
    WHERE per_user.depth >= l.level
    GROUP BY l.level
    ORDER BY level
    """,
)
def window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(14400)(ts, view, click, purchase)``
    analog (strict-increase mode): users reaching each ordered stage
    within 4 hours of the anchoring view (sized so the synthetic
    corpus exercises every level: 150/99/4 at sf0.01). One user-partitioned
    range-frame window + one exact-timestamp equi-join — no
    range-explosion join, no per-anchor rescans."""
    from clickhouse_realtime_analytics_demo_spark.operators.funnel import (
        funnel_levels,
        window_funnel as wf,
    )

    events = table(spark, sf_dir, "events")
    t = F.col("event_type")
    per_user = wf(
        events,
        stages=[t == "view", t == "click", t == "purchase"],
        window_us=14_400_000_000,
    )
    return funnel_levels(per_user, 3).orderBy("level")


@register("order_value_quantiles_approx")  # rows-only: t-digest-style
# sketch state has no DuckDB twin (same reason ClickHouse splits
# quantile from quantileExact); accuracy pinned vs the exact operator
# by tests/test_quantiles.py::test_approx_within_rank_tolerance
def order_value_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB quantile path: ``percentile_approx`` (bounded sketch
    state, map-side merge, NO per-group sort) over the same
    segment×prob grid as ``order_value_quantiles``. ClickHouse's
    ``quantile`` vs ``quantileExact`` split, reproduced."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
    )
    probs = [0.25, 0.5, 0.75, 0.9, 0.99]
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    agg = joined.groupBy("segment").agg(
        F.percentile_approx("o_totalprice", probs, 10_000).alias("qs")
    )
    pairs = F.arrays_zip(F.array(*[F.lit(p) for p in probs]), F.col("qs")).alias("pz")
    return (
        agg.select("segment", F.explode(pairs).alias("pq"))
        .select(
            "segment",
            F.col("pq")["0"].alias("prob"),
            F.col("pq")["qs"].alias("quantile"),
        )
        .orderBy("segment", "prob")
    )


@register(
    "sequence_match_levels",
    # Independent oracle: the greedy chain is restated as a cascade of
    # per-user MIN CTEs (earliest signup, earliest later click,
    # earliest later purchase) — joins instead of windows, so
    # agreement checks the operator's single-shuffle chained-window
    # form against a structurally different evaluation of the same
    # greedy-earliest argument. epoch_us on both sides.
    oracle="""
    WITH m0 AS (
        SELECT user_id, MIN(epoch_us(ts)) AS t0
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), m1 AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t1
        FROM events e JOIN m0 ON e.user_id = m0.user_id
        WHERE e.event_type = 'click' AND epoch_us(e.ts) > m0.t0
        GROUP BY e.user_id
    ), m2 AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
        FROM events e JOIN m1 ON e.user_id = m1.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > m1.t1
        GROUP BY e.user_id
    ), per_user AS (
        SELECT m0.user_id,
               1 + CASE WHEN m1.user_id IS NOT NULL THEN 1 ELSE 0 END
                 + CASE WHEN m2.user_id IS NOT NULL THEN 1 ELSE 0 END AS depth
        FROM m0
        LEFT JOIN m1 ON m0.user_id = m1.user_id
        LEFT JOIN m2 ON m0.user_id = m2.user_id
    )
    SELECT l.level, COUNT(*) AS users
    FROM per_user, (VALUES (1), (2), (3)) AS l(level)
    WHERE per_user.depth >= l.level
    GROUP BY l.level
    ORDER BY level
    """,
)
def sequence_match_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1).*(?2).*(?3)')(ts, signup,
    click, purchase)`` analog: the unwindowed ordered-chain funnel
    (any signup, then any later click, then any later purchase —
    anywhere in the user's history), reported as cumulative levels
    like ``window_funnel``. Reference ecosystem: sequenceMatch is the
    other half of ClickHouse's funnel pair (windowFunnel = bounded
    window, sequenceMatch = pattern existence). Single shuffle on the
    user key; no sort, no arrays (operators/funnel.py:sequence_match).
    """
    from clickhouse_realtime_analytics_demo_spark.operators.funnel import (
        funnel_levels,
        sequence_match as sm,
    )

    events = table(spark, sf_dir, "events")
    t = F.col("event_type")
    per_user = sm(events, stages=[t == "signup", t == "click", t == "purchase"])
    return funnel_levels(per_user, 3).orderBy("level")


@register(
    "purchase_retention",
    # Oracle restates retention() as per-user boolean flags then a
    # conditional count — the direct SQL form of the aggregate's
    # definition (r_i = cond_0 AND cond_i).
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase'
                         AND CAST(ts AS DATE) = DATE '2024-01-02'
                        THEN 1 ELSE 0 END) AS c0,
               MAX(CASE WHEN event_type = 'purchase'
                         AND CAST(ts AS DATE) = DATE '2024-01-03'
                        THEN 1 ELSE 0 END) AS c1,
               MAX(CASE WHEN event_type = 'purchase'
                         AND CAST(ts AS DATE) = DATE '2024-01-09'
                        THEN 1 ELSE 0 END) AS c2
        FROM events GROUP BY user_id
    )
    SELECT cond,
           users,
           CAST(ROUND(100.0 * users / NULLIF(base, 0), 2) AS DOUBLE) AS pct_of_base
    FROM (
        SELECT 0 AS cond, SUM(c0) AS users, SUM(c0) AS base FROM per_user
        UNION ALL
        SELECT 1, SUM(c0 * c1), SUM(c0) FROM per_user
        UNION ALL
        SELECT 2, SUM(c0 * c2), SUM(c0) FROM per_user
    )
    ORDER BY cond
    """,
)
def purchase_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``retention(cond_0, …, cond_n)`` analog (the classic
    day-0 / day-1 / day-7 cut): per user, flag_i = cond_0 AND cond_i
    with cond_0 = purchased on 2024-01-02, then day-1 and day-7
    re-purchase; summed across users with the retained share of the
    day-0 base. Two hash aggregates (user flags, then a 1-row global
    sum exploded to one row per condition) — the per-user stage
    map-side combines, the global stage moves n_users booleans, so
    the whole aggregate is one shuffle on the user key + a constant
    tail. Frozen-clock dates per the ANCHOR_DATE convention."""
    events = table(spark, sf_dir, "events")
    d = F.to_date("ts")
    is_p = F.col("event_type") == "purchase"

    def flag(day: str):
        return F.max(F.when(is_p & (d == F.lit(day).cast("date")), 1).otherwise(0))

    per_user = events.groupBy("user_id").agg(
        flag("2024-01-02").alias("c0"),
        flag("2024-01-03").alias("c1"),
        flag("2024-01-09").alias("c2"),
    )
    totals = per_user.agg(
        F.sum("c0").alias("base"),
        F.sum(F.col("c0") * F.col("c1")).alias("r1"),
        F.sum(F.col("c0") * F.col("c2")).alias("r2"),
    )
    conds = F.array(
        F.struct(F.lit(0).alias("cond"), F.col("base").alias("users")),
        F.struct(F.lit(1).alias("cond"), F.col("r1").alias("users")),
        F.struct(F.lit(2).alias("cond"), F.col("r2").alias("users")),
    )
    return (
        totals.select(F.explode(conds).alias("e"), "base")
        .select(
            F.col("e.cond").alias("cond"),
            F.col("e.users").alias("users"),
            F.round(
                100.0 * F.col("e.users") / F.nullif(F.col("base"), F.lit(0)), 2
            ).alias("pct_of_base"),
        )
        .orderBy("cond")
    )


@register(
    "event_type_top_users_state",
    # Exact because the state runs in its UNTRIMMED regime here:
    # counters=65536 far exceeds the user-id cardinality at every test
    # SF (1,500 at sf0.1 — measured), so each partial is a full count
    # map and the merge is plain addition; the MG trim's bound regime
    # is property-tested in tests/test_topk_state.py instead. Counts
    # and (cnt desc, user asc) tie-breaks are identical in both
    # engines, so ranks hash-match bit-for-bit.
    oracle="""
    WITH counted AS (
        SELECT event_type, CAST(user_id AS VARCHAR) AS user_key,
               COUNT(*) AS est_count
        FROM events WHERE user_id IS NOT NULL
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT event_type, user_key, est_count,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY est_count DESC, user_key ASC
               ) AS rnk
        FROM counted
    )
    SELECT event_type, user_key, CAST(est_count AS BIGINT) AS est_count,
           CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 5 ORDER BY event_type, rnk
    """,
)
def event_type_top_users_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 users per event type served FROM mergeable topK state —
    the ClickHouse ``topKState``/``topKMerge`` (AggregatingMergeTree)
    pattern the reference's State/Merge MVs use for counts
    (init-scripts/01-create-tables.sql:119-132), applied to heavy
    hitters: the stream is split into four micro-batch partials
    (streaming/topk_state.py::topk_partial — one bounded map row per
    group per batch), merged on read (``merge_states``), then cut to
    top-5. Batch ≡ merged-state equivalence is the property under
    test; the same partials write as idempotent ``b=<id>`` parquet
    parts in the streaming path (tests/test_topk_state.py)."""
    from clickhouse_realtime_analytics_demo_spark.streaming import topk_state

    events = table(spark, sf_dir, "events")
    # Single-scan formulation: the split id joins the partial's GROUP
    # key (one scan produces four genuine per-split summary rows per
    # group — the plan a 4-batch stream would have written), and the
    # merge groups by event_type alone, dropping the split. A filter-
    # per-split variant scanned events four times for the same result.
    split = F.pmod(F.hash("event_id"), F.lit(4)).alias("split")
    parts = topk_state.topk_partial(
        events.select("event_type", "user_id", split),
        ["event_type", "split"],
        "user_id",
        counters=65536,
    )
    merged = topk_state.merge_states(parts, ["event_type"], counters=65536)
    entries = merged.select(
        "event_type", F.explode("topk_mg").alias("user_key", "est_count")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("est_count").desc(), F.col("user_key").asc()
    )
    return (
        entries.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 5)
        .orderBy("event_type", "rnk")
    )


@register(
    "order_status_quantiles_state",
    # Exact by construction: the state holds per-status value→count
    # histograms over the integer cents domain (decimal(12,2)×100 is
    # integral in both engines), merge is count addition, and both
    # sides pick the value at the pinned nearest-rank
    # floor(p*(n-1))+1. Same definition as order_value_quantiles, a
    # structurally different evaluation (histogram cumsum vs row
    # ranks) — agreement proves the state machinery.
    oracle="""
    WITH j AS (
        SELECT o_orderstatus AS status,
               CAST(o_totalprice * 100 AS BIGINT) AS v,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_totalprice, o_orderkey) AS rn,
               count(*) OVER (PARTITION BY o_orderstatus) AS n
        FROM orders
    )
    SELECT status, CAST(p AS DOUBLE) AS prob, v AS quantile
    FROM j, (VALUES (0.25), (0.5), (0.75), (0.9), (0.99)) probs(p)
    WHERE rn = CAST(floor(CAST(p AS DOUBLE) * (n - 1)) AS BIGINT) + 1
    ORDER BY status, prob
    """,
)
def order_status_quantiles_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order-value quantiles per order status served FROM
    mergeable quantile state — the ClickHouse ``quantileExactState``/
    ``quantileExactMerge`` (AggregatingMergeTree) pattern: the stream
    splits into four micro-batch histogram partials
    (streaming/quantile_state.py, value→count maps over the integer
    cents domain), merges by count addition, and reads nearest-rank
    quantiles from the cumulative histogram. Batch ≡ merged-state is
    the property under test; the streaming write/replay/compaction
    paths are pinned in tests/test_quantile_state.py."""
    from clickhouse_realtime_analytics_demo_spark.streaming import quantile_state

    orders = table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice") * 100).cast("long")
    # Single-scan formulation (see event_type_top_users_state): the
    # split id rides the partial's group key; the merge drops it.
    split = F.pmod(F.hash("o_orderkey"), F.lit(4)).alias("split")
    parts = quantile_state.hist_partial(
        orders.select("o_orderstatus", "o_totalprice", split),
        ["o_orderstatus", "split"],
        cents,
    )
    # quantiles_from_state merges the partials by count addition
    # itself (the storable-map form is only for the write/compaction
    # path — see quantile_state.merge_states).
    return quantile_state.quantiles_from_state(
        parts, ["o_orderstatus"], [0.25, 0.5, 0.75, 0.9, 0.99]
    ).withColumnRenamed("o_orderstatus", "status")


@register("order_status_quantiles_tdigest")  # no oracle: bounded-size
# APPROXIMATE sketch (rank error ~O(1/compression)) — tolerance vs the
# exact nearest-rank twin is pinned locally in
# tests/test_tdigest_state.py + test_analytics_tdigest below, the A3
# (uniq) handling applied to quantiles. Driver records rows-only.
def order_status_quantiles_tdigest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value quantiles per status from the BOUNDED mergeable
    t-digest state (streaming/tdigest_state.py) — the ClickHouse
    ``quantileTDigestState``/``quantileTDigestMerge`` analog (VERDICT
    r11 #3). Unlike ``order_status_quantiles_state`` (exact, state
    bounded by DOMAIN cardinality), the digest is O(compression) per
    group on ANY domain — the 100 TB continuous-value path. Build is
    per-partition combiner-style (mapInPandas emits sketches, never
    rows, into the shuffle); extraction is relational (one group-keyed
    window pair + interpolation)."""
    from clickhouse_realtime_analytics_demo_spark.streaming import tdigest_state

    orders = table(spark, sf_dir, "orders")
    state = tdigest_state.tdigest_partial(
        orders.select(F.col("o_orderstatus").alias("status"), "o_totalprice"),
        ["status"],
        F.col("o_totalprice"),
    )
    return tdigest_state.quantiles_from_state(
        state, ["status"], [0.25, 0.5, 0.75, 0.9, 0.99]
    )
