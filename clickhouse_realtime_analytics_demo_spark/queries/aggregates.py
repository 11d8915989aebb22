"""Aggregation operators (SURVEY.md §2.4) + set ops (§2.7) + top-k (§2.6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.catalog import table
from clickhouse_realtime_analytics_demo_spark.queries._det import money_sum
from clickhouse_realtime_analytics_demo_spark.queries.registry import register


@register(
    "event_type_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS events,
           COUNT(DISTINCT user_id) AS unique_users,
           COUNT(*) FILTER (WHERE value > 250) AS high_value_events,
           CAST(SUM(CASE WHEN value > 250 THEN CAST(value AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS high_value_sum,
           CAST(MIN(value) AS DOUBLE) AS min_value,
           CAST(MAX(value) AS DOUBLE) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count / countDistinct / countIf / sumIf / min / max (A1-A5:
    countIf/sumIf use sites app_interactive.py:103-104,351-356).

    ``count_if`` and sum-over-CASE are the Spark spellings of
    ClickHouse's -If combinators; all partial-aggregate map-side.
    """
    events = table(spark, sf_dir, "events")
    high = F.col("value") > 250
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("events"),
            F.countDistinct("user_id").alias("unique_users"),
            F.count_if(high).alias("high_value_events"),
            F.sum(
                F.when(high, F.col("value").cast("decimal(18,2)")).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            )
            .cast("double")
            .alias("high_value_sum"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type")
    )


@register("approx_daily_uniques")  # no oracle: approximate by design (A3)
def approx_daily_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate count-distinct (A3: ClickHouse ``uniq(user_id)``
    app.py:57,94 → ``approx_count_distinct``, same HLL error class).

    Rows-only check: approximate results can't hash-match an exact
    oracle (SURVEY §7 hard-parts). ``daily_events`` carries the exact
    twin. At 100 TB this is THE scalable distinct: fixed-size sketch
    per group, no distinct shuffle.
    """
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(F.to_date("ts").alias("event_date"))
        .agg(F.approx_count_distinct("user_id").alias("approx_users"))
        .orderBy("event_date")
    )


@register(
    "event_funnel",
    oracle="""
    SELECT CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS DOUBLE)
             AS click_rate,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS DOUBLE)
             AS purchase_rate
    FROM events
    """,
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel counters via aggregate-over-CASE + ratio-of-aggregates
    (A6/A12: mv_user_funnel 01-create-tables.sql:127-129; conversion
    rates app.py:303-305)."""

    def step(t: str) -> F.Column:
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))

    return table(spark, sf_dir, "events").agg(
        step("view").alias("views"),
        step("click").alias("clicks"),
        step("purchase").alias("purchases"),
        # try_divide: NULL (not an ANSI DIVIDE_BY_ZERO error) when the
        # window holds no views — identical to plain division whenever
        # views > 0, which is the whole oracle-checked domain; the
        # zero-traffic case is the live route's empty-window poll
        # (reference guards with nullIf, app_interactive.py:343-377)
        F.try_divide(step("click").cast("double"), step("view").cast("double")).alias(
            "click_rate"
        ),
        F.try_divide(
            step("purchase").cast("double"), step("view").cast("double")
        ).alias("purchase_rate"),
    )


@register(
    "user_event_sequences",
    oracle="""
    SELECT user_id,
           COUNT(*) AS events,
           STRING_AGG(event_type, ' -> ' ORDER BY ts, event_id) AS sequence
    FROM events
    WHERE user_id <= 20
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered groupArray + arrayStringConcat (A11:
    sample_queries.sql:422 ``arrayStringConcat(groupArray(event_type),
    ' → ')`` per session).

    Spark: collect structs, array_sort by (ts, event_id) for a total
    order, project the event type, array_join. The (ts, event_id)
    tie-break makes the result deterministic under any partitioning.
    """
    events = table(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    seq = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda s: s["event_type"],
        ),
        " -> ",
    )
    return (
        events.groupBy("user_id")
        .agg(F.count("*").alias("events"), seq.alias("sequence"))
        .orderBy("user_id")
    )


@register(
    "avg_of_daily_avg",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(day_sum AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(SUM(day_events) AS DOUBLE) AS overall_avg,
           CAST(SUM(CAST(daily_avg AS DECIMAL(28,12))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_of_avgs
    FROM (
        SELECT event_type,
               CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_sum,
               COUNT(*) AS day_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                 AS daily_avg
        FROM events
        GROUP BY 1, 2
    )
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def avg_of_daily_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates of aggregates, preserving the reference's
    avg-of-avgs wart (A13: ``avg(mv.avg_order_value)``
    sample_queries.sql:67 — SURVEY notes this is intentional).

    avg_of_avgs sums |days| exact doubles — few enough that the
    decimal trick isn't needed; SUM over pre-rounded day_sum values
    is made order-independent by casting each to decimal first.
    """
    events = table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        money_sum(F.col("value")).alias("day_sum"),
        F.count("*").alias("day_events"),
        (money_sum(F.col("value")) / F.count("*").cast("double")).alias("daily_avg"),
    )
    return (
        daily.groupBy("event_type")
        .agg(
            (
                F.sum(F.col("day_sum").cast("decimal(18,2)")).cast("double")
                / F.sum("day_events").cast("double")
            ).alias("overall_avg"),
            (
                F.sum(F.col("daily_avg").cast("decimal(28,12)")).cast("double")
                / F.count("*").cast("double")
            ).alias("avg_of_avgs"),
        )
        .orderBy("event_type")
    )


@register(
    "period_comparison",
    oracle="""
    SELECT 'week1' AS period,
           COUNT(*) AS events,
           COUNT(DISTINCT user_id) AS unique_users
    FROM events WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
    UNION ALL
    SELECT 'week2' AS period,
           COUNT(*) AS events,
           COUNT(DISTINCT user_id) AS unique_users
    FROM events WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
    ORDER BY period
    """,
)
def period_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of uniform aggregate rows (U1:
    app_interactive.py:98-129 1min/5min/30min metric rows;
    sample_queries.sql:396-412 funnel steps)."""
    events = table(spark, sf_dir, "events")

    def week(label: str, lo: str, hi: str) -> DataFrame:
        return (
            events.filter(
                (F.col("ts") >= F.lit(lo).cast("timestamp"))
                & (F.col("ts") < F.lit(hi).cast("timestamp"))
            )
            .agg(
                F.count("*").alias("events"),
                F.countDistinct("user_id").alias("unique_users"),
            )
            .select(F.lit(label).alias("period"), "events", "unique_users")
        )

    return (
        week("week1", "2024-01-01", "2024-01-08")
        .unionByName(week("week2", "2024-01-08", "2024-01-15"))
        .orderBy("period")
    )


@register(
    "top_customers",
    oracle="""
    SELECT o_custkey AS custkey,
           COUNT(*) AS orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
    FROM orders
    GROUP BY o_custkey
    ORDER BY total_spent DESC, custkey
    LIMIT 10
    """,
)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY … DESC LIMIT n top-k (O1: app.py:154-156 top
    spenders; compiles to TakeOrderedAndProject — true distributed
    top-k, no global sort). Tie-break on custkey for determinism."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count("*").alias("orders"),
            money_sum(F.col("o_totalprice")).alias("total_spent"),
        )
        .orderBy(F.desc("total_spent"), "custkey")
        .limit(10)
    )


@register(
    "top_active_users",
    oracle="""
    SELECT user_id,
           COUNT(*) AS event_count,
           COUNT(DISTINCT event_type) AS event_types,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           MAX(ts) AS last_seen
    FROM events
    GROUP BY user_id
    ORDER BY event_count DESC, user_id
    LIMIT 10
    """,
)
def top_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-active users backing /api/live/top-users
    (app_interactive.py:306-341 contract: user_id/event_count/
    event_types/total_revenue/last_seen). Single-pass groupBy with one
    distinct agg (no Expand blowup), exact decimal money sum,
    distributed top-k (TakeOrderedAndProject), user_id tie-break."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("event_count"),
            F.countDistinct("event_type").alias("event_types"),
            money_sum(F.col("value")).alias("total_value"),
            F.max("ts").alias("last_seen"),
        )
        .orderBy(F.desc("event_count"), "user_id")
        .limit(10)
    )


@register(
    "orders_rollup",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (beyond-reference: SURVEY §2.4 notes
    grouping sets absent from the corpus; added as a first-class Spark
    capability for subtotal reports)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("orders"), money_sum(F.col("o_totalprice")).alias("revenue"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "orders",
            "revenue",
        )
        .orderBy("status", "priority")
    )


@register(
    "user_first_last_action",
    # Oracle restates argMin/argMax as two row_number() passes (the
    # window formulation of the same selection) — agreement checks the
    # sort-free aggregate against an independently-ordered evaluation.
    # Ties are impossible at the comparator: (ts, event_id) is unique
    # per row because event_id is unique.
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_type, value, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn_first,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn_last
        FROM events
    )
    SELECT f.user_id,
           f.event_type AS first_type,
           l.event_type AS last_type,
           l.value AS last_value,
           CAST(date_diff('second', f.ts, l.ts) AS BIGINT) AS lifespan_s
    FROM ranked f
    JOIN ranked l ON f.user_id = l.user_id
    WHERE f.rn_first = 1 AND l.rn_last = 1
    ORDER BY f.user_id
    """,
)
def user_first_last_action(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``argMin(event_type, (ts, event_id))`` /
    ``argMax(...)`` analog (the dialect shim maps argMax→max_by,
    plans/dialect.py:184; this registers the family as a first-class
    oracle-checked query): each user's first and last action plus
    account lifespan. One hash aggregate with map-side combine — at
    100 TB this is the argMax-vs-ROW_NUMBER trade that matters, since
    the aggregate keeps one candidate per key per partition while the
    window form must sort every partition; the oracle deliberately
    uses the window form so the two formulations check each other.
    The (ts, event_id) struct comparator makes the selection
    deterministic under ties exactly like the reference's
    ``argMax(x, (ts, id))`` tuple form."""
    events = table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.groupBy("user_id")
        .agg(
            F.min_by("event_type", key).alias("first_type"),
            F.max_by("event_type", key).alias("last_type"),
            F.max_by("value", key).alias("last_value"),
            F.min(key).alias("_first_key"),
            F.max(key).alias("_max_key"),
        )
        .select(
            "user_id",
            "first_type",
            "last_type",
            "last_value",
            # second-BOUNDARY count (truncate each endpoint, then
            # subtract), matching DuckDB/ClickHouse date_diff — NOT
            # floor(delta): the two differ whenever the endpoints'
            # sub-second fractions wrap.
            (
                F.floor(F.unix_micros(F.col("_max_key.ts")) / F.lit(1_000_000))
                - F.floor(F.unix_micros(F.col("_first_key.ts")) / F.lit(1_000_000))
            )
            .cast("long")
            .alias("lifespan_s"),
        )
        .orderBy("user_id")
    )
