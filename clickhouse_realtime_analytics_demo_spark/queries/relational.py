"""Scans, filters, projections, joins (SURVEY.md §2.1–§2.3).

Each query re-expresses a capability the reference exercises through
ClickHouse SQL (use-site citations in each docstring) as an idiomatic
Catalyst plan: filters/projections push down to the parquet scan, small
dimensions broadcast, aggregations pre-aggregate map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.catalog import table
from clickhouse_realtime_analytics_demo_spark.queries._det import (
    DEC,
    lineitem_revenue,
    money_avg,
    money_sum,
)
from clickhouse_realtime_analytics_demo_spark.queries.registry import register


@register(
    "daily_events",
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date,
           COUNT(*) AS events,
           COUNT(DISTINCT user_id) AS unique_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    ORDER BY event_date
    """,
)
def daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: daily event volume + exact uniques + value sum.

    Mirrors the reference's ``/api/daily-events`` (app.py:90-99:
    toDate(ts) group, count, uniq(user_id), 30-day filter). Uses exact
    countDistinct so the oracle matches; the approximate variant is
    ``approx_daily_uniques``.
    Scale: single shuffle on (event_date); partial counts map-side.
    """
    events = table(spark, sf_dir, "events")
    # two-phase (per-user partials, then per-day) instead of a mixed
    # countDistinct+sum aggregate: avoids the distinct-agg Expand that
    # doubles shuffle volume — measured 30% faster at sf0.1, decimal
    # sums exact so results are bit-identical. (user_id is non-null by
    # schema; a null group would count where countDistinct skips.)
    per_user = events.groupBy(F.to_date("ts").alias("event_date"), "user_id").agg(
        F.count("*").alias("c"),
        F.sum(F.col("value").cast(DEC)).alias("v"),
    )
    return (
        per_user.groupBy("event_date")
        .agg(
            F.sum("c").alias("events"),
            F.count("*").alias("unique_users"),
            F.sum("v").cast("double").alias("total_value"),
        )
        .orderBy("event_date")
    )


@register(
    "table_counts",
    oracle="""
    SELECT (SELECT COUNT(*) FROM lineitem) AS lineitem_rows,
           (SELECT COUNT(*) FROM orders) AS orders_rows,
           (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS ordering_customers,
           (SELECT COUNT(*) FROM customer) AS customer_rows
    """,
)
def table_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table-scan counts (S4: app.py:51 ``SELECT count() FROM users``).

    Spark: parquet row-group metadata answers COUNT(*) without a full
    scan (count pushdown); countDistinct is one shuffle on o_custkey.
    """
    li = table(spark, sf_dir, "lineitem").agg(F.count("*").alias("lineitem_rows"))
    orders = table(spark, sf_dir, "orders").agg(
        F.count("*").alias("orders_rows"),
        F.countDistinct("o_custkey").alias("ordering_customers"),
    )
    cust = table(spark, sf_dir, "customer").agg(F.count("*").alias("customer_rows"))
    return li.crossJoin(orders).crossJoin(cust)


@register(
    "filtered_event_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS events,
           COUNT(DISTINCT user_id) AS unique_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    WHERE event_type IN ('purchase', 'signup')
      AND ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND value > 100
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def filtered_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN + time-range + numeric-range predicates (P3/P4/P5).

    Reference use sites: ``event_type IN (...)``
    examples/sample_queries.sql:36; ``event_timestamp >= now() -
    INTERVAL 30 DAY`` app.py:59; ``revenue > 100``
    sample_queries.sql:451. Fixed literals keep the query
    deterministic (SURVEY §7 hard-parts note on wall-clock).
    All three predicates push down to the parquet scan.
    """
    events = table(spark, sf_dir, "events")
    return (
        events.filter(
            F.col("event_type").isin("purchase", "signup")
            & (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
            & (F.col("value") > 100)
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("events"),
            F.countDistinct("user_id").alias("unique_users"),
            money_sum(F.col("value")).alias("total_value"),
        )
        .orderBy("event_type")
    )


@register(
    "part_name_search",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM part
    WHERE p_name ILIKE '%ol%'
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def part_name_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ILIKE pattern search (P6: app.py:374 ``username ILIKE '%x%'``,
    sample_queries.sql:282 ``product_name LIKE '%Laptop%'``)."""
    part = table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_name").ilike("%ol%"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("parts"),
            money_sum(F.col("p_retailprice")).alias("total_price"),
        )
        .orderBy("p_brand")
    )


@register(
    "customer_segments",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 3000 THEN 'low'
                WHEN c_acctbal < 7000 THEN 'mid'
                ELSE 'high' END AS segment,
           COUNT(*) AS customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
    FROM customer
    GROUP BY 1
    ORDER BY segment
    """,
)
def customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN segmentation (P8: app.py:249-254 user segmentation by
    total_spent; 05-add-refreshable-mvs.sql.disabled:72-77 LTV tiers)."""
    cust = table(spark, sf_dir, "customer")
    segment = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    return (
        cust.groupBy(segment.alias("segment"))
        .agg(
            F.count("*").alias("customers"),
            money_sum(F.col("c_acctbal")).alias("total_balance"),
        )
        .orderBy("segment")
    )


@register(
    "frequent_buyers",
    oracle="""
    SELECT o_custkey AS custkey,
           COUNT(*) AS order_count,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_custkey
    HAVING COUNT(*) >= 5
    ORDER BY custkey
    """,
)
def frequent_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality predicate + HAVING post-agg filter (P2/P9:
    ``WHERE status='completed'`` app.py:67; ``HAVING co_purchase_count
    >= 5`` 05-add-refreshable-mvs.sql.disabled:188)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count("*").alias("order_count"),
            money_sum(F.col("o_totalprice")).alias("total_spent"),
        )
        .filter(F.col("order_count") >= 5)
        .orderBy("custkey")
    )


@register(
    "null_safe_ratios",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / NULLIF(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 0)
             AS price_per_unit,
           COALESCE(NULLIF(COUNT(*), 0), 0) AS line_count
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def null_safe_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nullIf/coalesce null handling (P10: app_interactive.py:354-356
    ``nullIf(page_views,0)``; sample_queries.sql:368-369 coalesce)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            (
                money_sum(F.col("l_extendedprice"))
                / F.nullif(money_sum(F.col("l_quantity")), F.lit(0.0))
            ).alias("price_per_unit"),
            F.coalesce(F.nullif(F.count("*"), F.lit(0)), F.lit(0)).alias("line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "segment_revenue",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment,
           COUNT(*) AS orders,
           COUNT(DISTINCT o.o_custkey) AS customers,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY mktsegment
    """,
)
def segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner fact⋈dim equi-join (J1: app.py:210-223 mv_product_revenue
    JOIN products).

    Scale: customer GROWS with scale factor, so no explicit
    broadcast hint (a hint would override autoBroadcastJoinThreshold
    and OOM the broadcast build at 100×). AQE still picks a broadcast
    join while customer fits under the threshold, and degrades to a
    shuffle join gracefully beyond it. Only catalog.BOUNDED_DIMS
    (region/nation) and 1-row scalar aggregates get explicit hints.
    """
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "inner")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count("*").alias("orders"),
            F.countDistinct("o_custkey").alias("customers"),
            money_sum(F.col("o_totalprice")).alias("revenue"),
        )
        .orderBy("mktsegment")
    )


@register(
    "customer_order_profile",
    oracle="""
    SELECT c.c_custkey AS custkey,
           c.c_mktsegment AS mktsegment,
           COALESCE(o.order_count, 0) AS order_count,
           COALESCE(o.total_spent, 0.0) AS total_spent
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey,
               COUNT(*) AS order_count,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        FROM orders
        GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    ORDER BY custkey
    """,
)
def customer_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join against an aggregated subquery (J2/J3: the
    user_analytics view 01-create-tables.sql:171-187 and the CLV job
    05-add-refreshable-mvs.sql.disabled:86-99).

    Scale: aggregate FIRST (shrinks orders to one row per customer),
    then join — the join input is |customers|, not |orders|.
    """
    cust = table(spark, sf_dir, "customer")
    per_cust = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("order_count"),
            money_sum(F.col("o_totalprice")).alias("total_spent"),
        )
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_mktsegment").alias("mktsegment"),
            F.coalesce("order_count", F.lit(0)).alias("order_count"),
            F.coalesce("total_spent", F.lit(0.0)).alias("total_spent"),
        )
        .orderBy("custkey")
    )


@register(
    "event_date_spine",
    oracle="""
    SELECT CAST(gs.generate_series AS DATE) AS day,
           COALESCE(e.events, 0) AS events
    FROM generate_series(DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY) gs
    LEFT JOIN (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS events
        FROM events GROUP BY 1
    ) e ON CAST(gs.generate_series AS DATE) = e.day
    ORDER BY day
    """,
)
def event_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap fill (S8+J4: ``numbers(30)`` spine ⟕ daily
    aggregates with coalesce-zero, sample_queries.sql:364-383).

    Spark: ``sequence()`` + ``explode`` generates the spine without a
    table; daily aggregate broadcasts onto it.
    """
    events = table(spark, sf_dir, "events")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-30").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("day")
    )
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(F.count("*").alias("events"))
    return (
        spine.join(daily, "day", "left")
        .select("day", F.coalesce("events", F.lit(0)).alias("events"))
        .orderBy("day")
    )


@register(
    "copurchased_parts",
    oracle="""
    SELECT a.l_partkey AS part_a,
           b.l_partkey AS part_b,
           COUNT(*) AS together
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    ORDER BY together DESC, part_a, part_b
    LIMIT 50
    """,
)
def copurchased_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket self-join with theta condition (J5:
    05-add-refreshable-mvs.sql.disabled:181-182 ``p1.product_id <
    p2.product_id``).

    Scale: equi-join on order key with the inequality as a residual
    condition; per-order fanout is bounded by basket size. Deterministic
    top-50 via (count desc, part_a, part_b) total order.

    Shape MEASURED against the tempting single-pass alternative
    (groupBy orderkey -> collect_list -> in-array pair expansion via
    nested transforms): that form shuffles lineitem once instead of
    twice, and won at sf0.1 (1.47 s vs 1.90 s, fixed overhead), but
    LOST 4x at 50x data (24.6 s vs 5.8 s, replicated-sf0.1 probe) —
    collect_list's object hash aggregation + per-basket array
    expression evaluation cost far more than the second columnar
    shuffle + sort-merge join, which stays in Tungsten end to end. On
    a network-bound cluster the byte-halving argument may flip this
    again; re-measure there before switching.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("together"))
        .filter(F.col("together") >= 2)
        .orderBy(F.desc("together"), "part_a", "part_b")
        .limit(50)
    )


@register(
    "nation_revenue",
    oracle="""
    SELECT n.n_name AS nation,
           r.r_name AS region,
           COUNT(DISTINCT o.o_orderkey) AS orders,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    ORDER BY nation
    """,
)
def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join chain (J6: basket pairs ⋈ products ⋈ products,
    05:183-184 — generalized to the TPC-H star).

    Scale: lineitem⋈orders is the one big (fact⋈fact) join — shuffle
    on orderkey. nation/region are BOUNDED_DIMS → explicit broadcast;
    customer grows with SF, so it carries NO hint — AQE broadcasts it
    while small and falls back to a shuffle join at scale instead of
    dying on a multi-GB broadcast build.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    # Pre-aggregate lineitem per order BELOW the join (aggregation
    # pushdown): the one big shuffle then carries map-side-combined
    # per-order partials, not raw lineitems, and the fact⋈fact join
    # shrinks to |orders|⋈|orders|. Decimal partial sums are exact, so
    # sum-of-sums stays bit-identical; inner joins keep the same
    # order set on both shapes. (Also avoids the mixed distinct-agg
    # Expand — the earlier two-phase form's motivation.)
    ord_rev = li.groupBy("l_orderkey").agg(F.sum(lineitem_revenue()).alias("ord_rev"))
    per_order = (
        ord_rev.join(orders, ord_rev.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        per_order.groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("orders"),
            F.sum("ord_rev").cast("double").alias("revenue"),
        )
        .orderBy("nation")
    )


@register(
    "nation_activity",
    oracle="""
    SELECT n_name AS nation,
           COUNT(*) AS orders,
           COUNT(DISTINCT o_custkey) AS users,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    ORDER BY orders DESC, nation
    LIMIT 10
    """,
)
def nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geographic activity rollup backing /api/live/geographic
    (app_interactive.py:183-220 contract: country/events/users/
    revenue), on the engine's star schema (nation ≙ country).

    Scale: orders pre-aggregates per customer BELOW the join, so the
    one sf-growing shuffle carries map-side-combined per-customer
    partials; after it, ``users`` is a plain COUNT(*) (each custkey
    appears once) — no COUNT DISTINCT expansion. Customer is
    hint-free (AQE broadcasts small, shuffles at scale); nation is a
    BOUNDED_DIM → explicit broadcast. Money stays decimal through
    both aggregation levels (sum-of-sums exact), double only at the
    edge."""
    from clickhouse_realtime_analytics_demo_spark.queries._det import DEC

    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec"),
    )
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum("cnt").alias("orders"),
            F.count("*").alias("users"),
            F.sum("rev_dec").cast("double").alias("revenue"),
        )
        .orderBy(F.desc("orders"), "nation")
        .limit(10)
    )


@register(
    "parts_above_avg",
    oracle="""
    SELECT p_partkey AS partkey,
           p_retailprice AS retailprice,
           (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                   / CAST(COUNT(p_retailprice) AS DOUBLE)
            FROM part) AS avg_price
    FROM part
    WHERE p_retailprice > (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                                  / CAST(COUNT(p_retailprice) AS DOUBLE)
                           FROM part)
    ORDER BY partkey
    """,
)
def parts_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (J9: 14 independent ``(SELECT …)``
    metrics, 05-add-refreshable-mvs.sql.disabled:206-223).

    Spark: compute the scalar once, crossJoin (broadcast of a 1-row
    relation) — the same physical shape Catalyst produces for a scalar
    subquery.
    """
    part = table(spark, sf_dir, "part")
    avg_price = part.agg(money_avg(F.col("p_retailprice")).alias("avg_price"))
    return (
        part.crossJoin(F.broadcast(avg_price))
        .filter(F.col("p_retailprice") > F.col("avg_price"))
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_retailprice").alias("retailprice"),
            "avg_price",
        )
        .orderBy("partkey")
    )


@register(
    "parts_above_brand_avg",
    oracle="""
    SELECT p.p_partkey AS partkey,
           p.p_brand AS brand,
           p.p_retailprice AS retailprice,
           b.brand_avg AS brand_avg
    FROM part p
    JOIN (
        SELECT p_brand,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                 / CAST(COUNT(p_retailprice) AS DOUBLE) AS brand_avg
        FROM part GROUP BY p_brand
    ) b ON p.p_brand = b.p_brand
    WHERE p.p_retailprice > b.brand_avg
    ORDER BY partkey
    """,
)
def parts_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery, decorrelated (J8:
    05-add-refreshable-mvs.sql.disabled:176-180 per-product divisor).

    Decorrelation = pre-aggregate per key then join — the scalable
    plan (one pass + broadcast join) vs per-row subquery execution.
    """
    part = table(spark, sf_dir, "part")
    brand_avg = part.groupBy("p_brand").agg(money_avg(F.col("p_retailprice")).alias("brand_avg"))
    return (
        part.join(F.broadcast(brand_avg), "p_brand")
        .filter(F.col("p_retailprice") > F.col("brand_avg"))
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_brand").alias("brand"),
            F.col("p_retailprice").alias("retailprice"),
            "brand_avg",
        )
        .orderBy("partkey")
    )


@register(
    "active_customers_semi",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
    ORDER BY custkey
    """,
)
def active_customers_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti join (the idiomatic form of the reference's
    ``WHERE o.user_id IS NOT NULL`` effective-inner at 05:99; SURVEY
    §2.3 notes left_semi as the Spark idiom).

    Scale: left_semi/left_anti never materialize the right side's
    payload columns and stop probing on first match.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    open_orders = orders.filter(F.col("o_orderstatus") == "O")
    finished = orders.filter(F.col("o_orderstatus") == "F")
    return (
        cust.join(open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi")
        .join(finished, F.col("c_custkey") == finished.o_custkey, "left_anti")
        .select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
        .orderBy("custkey")
    )


@register(
    "event_props_json",
    # JSON semantics pinned identical: both engines extract $.k as a
    # string and cast to BIGINT (missing key / malformed JSON → NULL
    # on both sides, exercised by the IS NOT NULL / predicate split);
    # all aggregates are exact integers.
    oracle="""
    SELECT event_type,
           COUNT(*) AS events,
           COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS with_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
           COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS distinct_k,
           CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def event_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction + aggregation over the ``props``
    column — the ClickHouse ``JSONExtract*`` family (visitParamExtract
    / simpleJSON in older demos) mapped to Spark's ``get_json_object``
    (§2.8 function map). The extraction is a JVM-side path expression
    inside whole-stage codegen — no UDF, no Python; at 100 TB only the
    projected key leaves the scan, and the predicate (`k >= 50`) is a
    plain integer comparison after extraction."""
    events = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("events"),
            F.count(k).alias("with_k"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
            F.countDistinct(k).alias("distinct_k"),
            F.sum(F.when(k >= 50, 1).otherwise(0)).alias("high_k"),
        )
        .orderBy("event_type")
    )
