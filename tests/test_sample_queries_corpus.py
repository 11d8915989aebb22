"""Corpus-sweep gate (r11 VERDICT ask #1): every statement of the
reference's examples/sample_queries.sql — all 559 lines, 9 sections,
35 statements — runs VERBATIM through dialect.rewrite + gateway.execute
against reference-shaped fixtures (plans/corpus.py), with DuckDB
value checks where the statement is oracle-expressible.

Check tiers (spec per statement below):
- exact:    full value comparison vs a DuckDB twin on the same parquet
            (float cells at 1e-6 relative tolerance — avg() is decimal
            arithmetic on Spark, double on DuckDB)
- cols:     value comparison over a column subset (uniq()-derived
            columns excluded — approx HLL vs exact distinct; plus
            collect_list ordering, per the A3/A11 oracle policy)
- rowcount: exact row count (statements whose LIMIT cuts through an
            ORDER BY tie, where the reference itself leaves the
            boundary rows engine-ordered)
- nonempty: result has rows (system.* introspection shapes)
- plan:     EXPLAIN statements — non-empty Catalyst plan text
- executes: runs and returns a stable schema (0 rows by design, e.g.
            the 'some-session-id' placeholder)

Since round 13 corpus.PATCHES is EMPTY: the last divergence (ex_2_4,
ClickHouse resolving SELECT-list aliases over same-named base columns)
is handled by dialect._inline_select_aliases, so all 35 statements run
verbatim; a dedicated test pins the alias-precedence semantics on the
verbatim text.
"""

from __future__ import annotations

import re
from decimal import Decimal
from pathlib import Path

import pytest

from clickhouse_realtime_analytics_demo_spark.plans import corpus

pytestmark = pytest.mark.skipif(
    not Path(corpus.DEFAULT_CORPUS).exists(),
    reason="reference corpus file not available",
)

TODAY = corpus.PINNED_TODAY  # 2024-03-30, inside the fixture window


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("corpus_fixtures"))
    corpus.prepare_reference_env(spark, data_dir)
    con = corpus.duck_reference_env(data_dir)
    stmts = {s.label: s for s in corpus.load_corpus()}
    return spark, con, stmts


# ---------------------------------------------------------------- helpers

def _norm(v, for_sort: bool):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        return round(v, 4) if for_sort else v
    if hasattr(v, "isoformat"):
        return str(v)[:19]
    return v


def _sorted_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i], False) for i in order) for r in rows]
    keys = [tuple(repr(_norm(c, True)) for c in row) for row in out]
    return [row for _, row in sorted(zip(keys, out))]


def _cells_match(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is None and b is None
        fa, fb = float(a), float(b)
        return abs(fa - fb) <= 1e-6 * max(1.0, abs(fa), abs(fb))
    return a == b


def assert_values_match(sdf, con, duck_sql: str, drop: tuple[str, ...] = ()):
    keep = [c for c in sdf.columns if c not in drop]
    srows = [tuple(r[c] for c in keep) for r in sdf.collect()]
    res = con.sql(duck_sql)
    dcols, drows = list(res.columns), res.fetchall()
    assert sorted(keep) == sorted(dcols), (sorted(keep), sorted(dcols))
    # duck rows reordered to spark's kept-column order before sorting
    dmap = {c: i for i, c in enumerate(dcols)}
    drows = [tuple(r[dmap[c]] for c in keep) for r in drows]
    assert len(srows) == len(drows), (len(srows), len(drows))
    sn, dn = _sorted_rows(srows, keep), _sorted_rows(drows, keep)
    for i, (a, b) in enumerate(zip(sn, dn)):
        for ca, cb in zip(a, b):
            assert _cells_match(ca, cb), (i, a, b)


D = f"DATE '{TODAY}'"
TS = f"TIMESTAMP '{TODAY} 12:00:00'"

# ------------------------------------------------------- per-statement spec
# ("exact"|"cols", duck_sql, drop_cols) / ("rowcount", n) / ("nonempty",)
# / ("plan",) / ("executes",)

CHECKS: dict[str, tuple] = {
    "use": ("directive",),
    "ex_1_1": (
        "exact",
        f"""SELECT country, COUNT(*) as user_count, AVG(age) as avg_age,
            SUM(is_premium) as premium_users, SUM(total_spent) as total_spent
            FROM users GROUP BY country ORDER BY user_count DESC LIMIT 10""",
        (),
    ),
    "ex_1_2": (
        "cols",
        f"""SELECT event_type, COUNT(*) as event_count, SUM(revenue) as total_revenue,
            AVG(duration_seconds) as avg_duration
            FROM events
            WHERE event_type IN ('purchase', 'add_to_cart', 'page_view')
              AND event_date >= {D} - INTERVAL 7 DAY
            GROUP BY event_type""",
        ("unique_users",),
    ),
    # 2112 (date,hour,type) groups cut to 100 by ORDER BY (date,hour)
    # alone — the boundary rows within the last hour block are
    # engine-ordered in the reference too.
    "ex_2_1": ("rowcount", 100),
    "ex_2_2": (
        "exact",
        f"""SELECT p.product_name, p.category, SUM(mv.total_revenue) as revenue,
            SUM(mv.order_count) as orders, AVG(mv.avg_order_value) as avg_order_value
            FROM mv_product_revenue mv JOIN products p ON mv.product_id = p.product_id
            WHERE mv.status = 'completed' AND mv.order_date >= {D} - INTERVAL 30 DAY
            GROUP BY p.product_id, p.product_name, p.category
            ORDER BY revenue DESC LIMIT 20""",
        (),
    ),
    "ex_2_3": (
        "exact",
        f"""SELECT SUM(total_events) as total_events, SUM(page_views) as page_views,
            SUM(cart_adds) as cart_adds, SUM(purchases) as purchases,
            SUM(total_revenue) as revenue,
            round(SUM(purchases) * 100.0 / SUM(page_views), 2) as conversion_rate,
            round(SUM(cart_adds) * 100.0 / SUM(page_views), 2) as cart_rate
            FROM mv_user_funnel WHERE event_date >= {D} - INTERVAL 30 DAY""",
        (),
    ),
    "ex_2_4": (
        "cols",
        f"""SELECT country, SUM(event_count) as total_events,
            SUM(total_revenue) as revenue
            FROM mv_country_stats WHERE event_date >= {D} - INTERVAL 30 DAY
            GROUP BY country ORDER BY revenue DESC LIMIT 15""",
        ("unique_users", "revenue_per_user"),
    ),
    "ex_3_1": (
        "exact",
        f"""SELECT event_id, event_type, event_timestamp, page_url, revenue
            FROM events WHERE user_id = 1234
            ORDER BY event_timestamp DESC LIMIT 50""",
        (),
    ),
    "ex_3_2": (
        "exact",
        f"""SELECT country, event_type, COUNT(*) as events, SUM(revenue) as revenue
            FROM events WHERE country = 'US' AND event_date >= {D} - INTERVAL 7 DAY
            GROUP BY country, event_type ORDER BY events DESC""",
        (),
    ),
    "ex_3_3": (
        "exact",
        """SELECT session_id, event_timestamp, event_type, page_url, duration_seconds
           FROM events WHERE session_id = 'some-session-id' ORDER BY event_timestamp""",
        (),
    ),
    "ex_3_4": ("rowcount", 100),  # LIMIT through total_spent ties
    "ex_4_1": ("executes",),  # dictGet family value-checked in test_dictionaries
    "ex_4_2": ("executes",),
    "ex_4_3": ("executes",),
    "ex_4_4": ("executes",),
    "ex_5_1": (
        "exact",
        f"""SELECT rank, product_name, category, total_revenue, total_orders,
            round(avg_order_value, 2) as avg_order_value
            FROM mv_top_products_ranking WHERE rank_date = {D}
            ORDER BY rank LIMIT 20""",
        (),
    ),
    "ex_5_2": (
        "exact",
        f"""SELECT user_id, username, country, ltv_segment, lifetime_value,
            total_orders, recency_days,
            round(recency_percentile * 100, 1) as recency_score,
            round(frequency_percentile * 100, 1) as frequency_score,
            round(monetary_percentile * 100, 1) as monetary_score
            FROM mv_customer_ltv WHERE ltv_segment IN ('High Value', 'Medium Value')
            ORDER BY lifetime_value DESC LIMIT 50""",
        (),
    ),
    "ex_5_3": ("rowcount", 12),  # LIMIT through per-month week ties
    "ex_5_4": ("nonempty",),  # LIMIT through small-int count ties
    "ex_5_5": (
        "cols",
        f"""SELECT metric_date, last_updated, total_users, premium_users,
            new_users_today, round(revenue_today, 2) as revenue_today,
            round(revenue_7d, 2) as revenue_7d, round(revenue_30d, 2) as revenue_30d,
            orders_today, round(avg_order_value_today, 2) as avg_order_value,
            conversion_rate_today
            FROM mv_daily_kpi_summary WHERE metric_date = {D}""",
        ("active_users_today", "active_users_7d", "active_users_30d"),
    ),
    "ex_6_1": (
        "exact",
        f"""SELECT category, product_name, revenue, rank FROM (
              SELECT p.category, p.product_name, SUM(o.total_amount) as revenue,
                     row_number() OVER (PARTITION BY p.category
                                        ORDER BY SUM(o.total_amount) DESC) as rank
              FROM orders o JOIN products p ON o.product_id = p.product_id
              WHERE o.status = 'completed' AND o.order_date >= {D} - INTERVAL 30 DAY
              GROUP BY p.category, p.product_id, p.product_name
            ) WHERE rank <= 5 ORDER BY category, rank""",
        (),
    ),
    "ex_6_2": (
        "exact",
        f"""SELECT event_date, event_count,
            sum(event_count) OVER (ORDER BY event_date) as cumulative_events,
            avg(event_count) OVER (ORDER BY event_date
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) as moving_avg_7d
            FROM (SELECT event_date, COUNT(*) as event_count FROM events
                  WHERE event_date >= {D} - INTERVAL 30 DAY GROUP BY event_date)
            ORDER BY event_date""",
        (),
    ),
    "ex_6_3": ("rowcount", 100),  # row_number/ntile over total_spent ties
    "ex_7_1": (
        "cols",
        f"""SELECT d.date, coalesce(e.event_count, 0) as events
            FROM (SELECT CAST({TS} - number * INTERVAL 1 DAY AS DATE) as date
                  FROM range(30) t(number)) d
            LEFT JOIN (SELECT event_date as date, COUNT(*) as event_count
                       FROM events WHERE event_date >= {D} - INTERVAL 30 DAY
                       GROUP BY event_date) e ON d.date = e.date
            ORDER BY d.date""",
        ("users",),
    ),
    "ex_7_2": (
        "exact",
        f"""WITH funnel_steps AS (
              SELECT user_id,
                max(CASE WHEN event_type = 'page_view' THEN 1 ELSE 0 END) as step_1_view,
                max(CASE WHEN event_type = 'add_to_cart' THEN 1 ELSE 0 END) as step_2_cart,
                max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) as step_3_purchase
              FROM events WHERE event_date >= {D} - INTERVAL 30 DAY GROUP BY user_id)
            SELECT 'Step 1: Page View' as step, SUM(step_1_view) as users,
                   100.0 as conversion_rate FROM funnel_steps
            UNION ALL
            SELECT 'Step 2: Add to Cart', SUM(step_2_cart),
                   SUM(step_2_cart) * 100.0 / SUM(step_1_view) FROM funnel_steps
            UNION ALL
            SELECT 'Step 3: Purchase', SUM(step_3_purchase),
                   SUM(step_3_purchase) * 100.0 / SUM(step_2_cart) FROM funnel_steps""",
        (),
    ),
    "ex_7_3": (
        "cols",
        f"""SELECT user_id, session_start, COUNT(*) as events_in_session,
            SUM(duration_seconds) as total_duration, SUM(revenue) as session_revenue
            FROM (SELECT user_id, event_id, event_type, event_timestamp,
                         duration_seconds, revenue,
                         time_bucket(INTERVAL '30 minutes', event_timestamp) as session_start
                  FROM events WHERE user_id = 1234
                    AND event_date >= {D} - INTERVAL 7 DAY)
            GROUP BY user_id, session_start ORDER BY session_start DESC""",
        ("event_sequence",),  # collect_list order — A11 oracle policy
    ),
    "ex_7_4": ("rowcount", 100),  # LIMIT through revenue ties
    "ex_8_1": ("plan",),
    "ex_8_2": ("plan",),
    "ex_8_3": ("plan",),
    "ex_8_4": ("executes",),  # query_log contents are wall-clock-dependent
    "check_compression_effectiveness": ("nonempty",),
    "check_dictionary_status": ("nonempty",),
    "check_table_sizes_and_row_counts": ("nonempty",),
    "check_materialized_views_and_their_dependencies": ("nonempty",),
}


def test_corpus_is_fully_covered(env):
    """Every statement of the file has a spec — a statement added to
    the reference corpus without a gate entry fails here."""
    _, _, stmts = env
    assert len(stmts) == 35
    assert set(stmts) == set(CHECKS)


@pytest.mark.parametrize("label", sorted(CHECKS))
def test_corpus_statement(env, label):
    spark, con, stmts = env
    stmt = stmts[label]
    spec = CHECKS[label]
    df = corpus.run_statement(spark, stmt)
    if spec[0] == "directive":
        assert df is None
        return
    if spec[0] in ("exact", "cols"):
        assert_values_match(df, con, spec[1], drop=spec[2])
    elif spec[0] == "rowcount":
        assert df.count() == spec[1]
    elif spec[0] == "nonempty":
        assert df.count() > 0
    elif spec[0] == "plan":
        rows = df.collect()
        assert rows and "Physical Plan" in rows[0][0]
    elif spec[0] == "executes":
        df.collect()  # runs; schema stable
        assert df.columns
    else:  # pragma: no cover
        raise AssertionError(spec)


def test_ex_2_4_verbatim_alias_precedence(env):
    """r13 (VERDICT r12 #1): the formerly-patched statement now runs
    VERBATIM — corpus.PATCHES is empty — and resolves the ClickHouse
    way: `revenue / unique_users` means the SELECT aliases
    (SUM(total_revenue) / SUM(unique_users)), not the base columns.
    Pinned by internal consistency on the verbatim result: every row's
    revenue_per_user equals round(revenue/unique_users, 2) computed
    from the SAME row's aggregate columns (Spark's own resolution
    would have failed analysis on the bare base column, or — worse —
    divided by a non-aggregated value)."""
    spark, _, stmts = env
    assert corpus.PATCHES == {}
    rows = corpus.run_statement(
        spark, stmts["ex_2_4"], apply_patches=False
    ).collect()
    assert rows
    for r in rows:
        assert r["unique_users"] > 0
        want = round(float(r["revenue"]) / float(r["unique_users"]), 2)
        assert abs(float(r["revenue_per_user"]) - want) < 1e-9, dict(r.asDict())


def test_value_check_coverage_floor(env):
    """At least 16 of the 30 non-directive SQL statements are value-
    checked against DuckDB (the rest are tie-boundary/approx/plan
    shapes, each with its reason in CHECKS)."""
    kinds = [s[0] for s in CHECKS.values()]
    assert kinds.count("exact") + kinds.count("cols") >= 16
