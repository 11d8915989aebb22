"""ClickHouse->Spark dialect shim (plans/dialect.py) and read-only SQL
gateway (plans/gateway.py).

Two layers of coverage:

1. string-level rewrite assertions for each construct the reference
   corpus uses (SURVEY.md §2.8, §3.3);
2. end-to-end: ClickHouse-dialect SQL through the gateway against the
   driver's parquet tables, value-checked against a DuckDB oracle
   running equivalent ANSI SQL on the same files.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, duck_connection, normalize

from clickhouse_realtime_analytics_demo_spark import catalog
from clickhouse_realtime_analytics_demo_spark.plans import dialect, gateway


# ---------------------------------------------------------------- rewrite unit

def test_function_renames():
    out = dialect.rewrite("SELECT toDate(ts), toHour(ts), uniq(user_id), countIf(x > 1) FROM t")
    assert "to_date(ts)" in out
    assert "hour(ts)" in out
    assert "approx_count_distinct(user_id)" in out
    assert "count_if(CAST(x > 1 AS BOOLEAN))" in out


def test_nested_calls_rewrite():
    out = dialect.rewrite("SELECT toYYYYMM(toDate(now() - INTERVAL 7 DAY)) FROM t")
    assert "date_format(to_date(current_timestamp() - INTERVAL 7 DAY), 'yyyyMM')" in out


def test_string_literals_untouched():
    sql = "SELECT 'toDate(x) uniq(y)' AS s, uniq(z) FROM t"
    out = dialect.rewrite(sql)
    assert "'toDate(x) uniq(y)'" in out
    assert "approx_count_distinct(z)" in out


def test_comments_untouched():
    out = dialect.rewrite("SELECT uniq(x) -- uniq(y) comment\nFROM t")
    assert "-- uniq(y) comment" in out
    assert out.count("approx_count_distinct") == 1


def test_sumif_zero_default():
    out = dialect.rewrite("SELECT sumIf(revenue, event_type = 'purchase') FROM t")
    # the CAST(... AS BOOLEAN) wrap is ClickHouse's UInt8-condition
    # coercion (identity on booleans) — see dialect._cond
    assert out == (
        "SELECT coalesce(sum(CASE WHEN CAST(event_type = 'purchase' AS BOOLEAN)"
        " THEN revenue END), 0) FROM t"
    )


def test_prewhere_merges_into_where():
    out = dialect.rewrite(
        "SELECT count() FROM events PREWHERE event_type = 'purchase' WHERE value > 100 GROUP BY user_id"
    )
    assert "PREWHERE" not in out.upper()
    assert "WHERE (event_type = 'purchase') AND value > 100" in out


def test_prewhere_without_where():
    out = dialect.rewrite("SELECT count() FROM events PREWHERE value > 5 ORDER BY 1")
    assert "WHERE value > 5" in out
    assert "PREWHERE" not in out.upper()


def test_numbers_table_function():
    out = dialect.rewrite("SELECT number FROM numbers(30)")
    assert "range(30)" in out


def test_multiif_and_if():
    out = dialect.rewrite("SELECT multiIf(a > 1, 'x', b > 2, 'y', 'z'), if(c, 1, 0) FROM t")
    # conditions ride dialect._cond (ClickHouse UInt8 coercion) — the
    # bare-int form if(c, 1, 0) is the very case that needs it
    assert (
        "CASE WHEN CAST(a > 1 AS BOOLEAN) THEN 'x'"
        " WHEN CAST(b > 2 AS BOOLEAN) THEN 'y' ELSE 'z' END"
    ) in out
    assert "CASE WHEN CAST(c AS BOOLEAN) THEN 1 ELSE 0 END" in out


def test_datediff_month_boundary_semantics(spark):
    # ClickHouse dateDiff('month', ...) counts month-boundary crossings:
    # Jan-31 -> Feb-01 is 1 month even though it's one day.
    out = dialect.rewrite("SELECT dateDiff('month', DATE'2024-01-31', DATE'2024-02-01') AS m")
    assert spark.sql(out).collect()[0].m == 1
    out2 = dialect.rewrite("SELECT dateDiff('day', DATE'2024-01-31', DATE'2024-02-01') AS d")
    assert spark.sql(out2).collect()[0].d == 1


def test_nonliteral_interval():
    out = dialect.rewrite("SELECT d - INTERVAL number DAY FROM t")
    assert "make_interval(0, 0, 0, CAST(number AS INT), 0, 0, 0)" in out
    # literal intervals stay native
    assert "INTERVAL 7 DAY" in dialect.rewrite("SELECT x - INTERVAL 7 DAY")


# ---------------------------------------------------------------- gateway

def test_gateway_rejects_writes():
    for bad in (
        "INSERT INTO t VALUES (1)",
        "DROP TABLE t",
        "SELECT 1; DROP TABLE t",
        "CREATE TABLE t (x INT)",
        "",
    ):
        with pytest.raises(gateway.QueryRejected):
            gateway.validate(bad)


def test_gateway_blocked_keyword_word_boundary():
    # column named created_at must NOT trip the CREATE blocklist
    gateway.validate("SELECT created_at FROM t")
    # keyword inside a string literal must not trip either
    gateway.validate("SELECT 'please do not DROP anything' FROM t")
    with pytest.raises(gateway.QueryRejected):
        gateway.validate("SELECT * FROM t WHERE x = 1 UNION SELECT 1 FROM y; DELETE FROM t")


# ------------------------------------------------------- end-to-end vs DuckDB

def _run_both(spark, ch_sql: str, duck_sql: str):
    res = gateway.execute(spark, ch_sql)
    sdf = res.df
    s_rows = normalize([tuple(r) for r in sdf.collect()], sdf.columns)
    con = duck_connection(SF_DIR)
    rel = con.sql(duck_sql)
    d_rows = normalize(rel.fetchall(), rel.columns)
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert s_rows == d_rows


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    catalog.register(spark, SF_DIR)


def test_e2e_daily_events_clickhouse_dialect(spark):
    # the flagship /api/daily-events shape written in ClickHouse SQL
    # (app.py:90-99) with a literal date bound for determinism.
    ch = """
        SELECT toDate(ts) AS event_date,
               count() AS total_events,
               uniqExact(user_id) AS unique_users
        FROM events
        PREWHERE event_type IN ('purchase', 'click')
        GROUP BY event_date
        ORDER BY event_date DESC
        LIMIT 30
    """
    duck = """
        SELECT CAST(ts AS DATE) AS event_date,
               count(*) AS total_events,
               count(DISTINCT user_id) AS unique_users
        FROM events
        WHERE event_type IN ('purchase', 'click')
        GROUP BY event_date
        ORDER BY event_date DESC
        LIMIT 30
    """
    _run_both(spark, ch, duck)


def test_e2e_sumif_countif(spark):
    ch = """
        SELECT event_type,
               countIf(value > 50) AS high_cnt,
               round(sumIf(value, value > 50), 2) AS high_sum
        FROM events GROUP BY event_type
    """
    duck = """
        SELECT event_type,
               count(*) FILTER (WHERE value > 50) AS high_cnt,
               round(coalesce(sum(value) FILTER (WHERE value > 50), 0), 2) AS high_sum
        FROM events GROUP BY event_type
    """
    _run_both(spark, ch, duck)


def test_e2e_date_spine_numbers(spark):
    # numbers(30)-style date spine (examples/sample_queries.sql:364-383)
    # anchored to a literal date for determinism.
    ch = """
        SELECT toDate(DATE'2025-06-30' - INTERVAL number DAY) AS d
        FROM numbers(30)
        ORDER BY d
    """
    duck = """
        SELECT CAST(DATE '2025-06-30' - INTERVAL (n) DAY AS DATE) AS d
        FROM (SELECT unnest(generate_series(0, 29)) AS n)
        ORDER BY d
    """
    _run_both(spark, ch, duck)


def test_e2e_tostartofinterval_sessions(spark):
    # 30-minute fixed-bucket sessionization (sample_queries.sql:414-438)
    ch = """
        SELECT user_id,
               toStartOfInterval(ts, INTERVAL 30 MINUTE) AS session_bucket,
               count() AS events_in_session
        FROM events
        GROUP BY user_id, session_bucket
        HAVING events_in_session >= 2
        ORDER BY user_id, session_bucket
        LIMIT 100
    """
    duck = """
        SELECT user_id,
               to_timestamp((epoch(ts)::BIGINT // 1800) * 1800) AT TIME ZONE 'UTC' AS session_bucket,
               count(*) AS events_in_session
        FROM events
        GROUP BY user_id, session_bucket
        HAVING count(*) >= 2
        ORDER BY user_id, session_bucket
        LIMIT 100
    """
    _run_both(spark, ch, duck)


def test_logical_views_registered(spark):
    catalog.register(spark, SF_DIR)
    ua = spark.sql("SELECT * FROM user_analytics ORDER BY total_events DESC LIMIT 5").collect()
    assert len(ua) == 5 and ua[0].total_events >= ua[-1].total_events
    ca = spark.sql(
        "SELECT count(*) AS n, sum(orders) AS o FROM customer_analytics"
    ).collect()[0]
    assert ca.n > 0 and ca.o > 0
    # view through the ClickHouse-dialect gateway too
    res = gateway.execute(
        spark, "SELECT uniq(user_id) AS u FROM user_analytics PREWHERE total_events > 1"
    )
    assert res.df.collect()[0].u > 0


def test_type_conversion_family(spark):
    row = spark.sql(dialect.rewrite(
        "SELECT toString(42) AS s, toInt64('7') AS i, toFloat64('2.5') AS f, "
        "toDecimal64('3.14', 2) AS d, toUInt8(1) AS u"
    )).collect()[0]
    assert (row.s, row.i, row.f, float(row.d), row.u) == ("42", 7, 2.5, 3.14, 1)


def test_array_family_and_split(spark):
    row = spark.sql(dialect.rewrite(
        "SELECT splitByChar('|', 'a|b|c') AS parts, "
        "arrayLength(splitByChar('|', 'a|b|c')) AS n, "
        "arrayDistinct(splitByString(',', 'x,x,y')) AS ds"
    )).collect()[0]
    assert list(row.parts) == ["a", "b", "c"]  # literal '|', not regex any-char
    assert row.n == 3
    assert sorted(row.ds) == ["x", "y"]
    rows = spark.sql(dialect.rewrite(
        "SELECT arrayJoin(splitByChar(',', 'p,q')) AS v"
    )).collect()
    assert [r.v for r in rows] == ["p", "q"]


def test_json_function_rewrites():
    out = dialect.rewrite(
        "SELECT JSONExtractInt(props, 'k'), JSONExtractString(props, 'a', 'b'),"
        " JSONHas(props, 'k'), JSONExtractFloat(props, 'arr', '2') FROM events"
    )
    # numeric extracts coalesce to ClickHouse's missing-key defaults
    # (0 / 0.0), JSONHas is a summable 0/1 INT (r11 ADVICE) probed via
    # json_object_keys so a JSON-null value still counts (r12 VERDICT #6)
    assert "coalesce(CAST(get_json_object(props, '$.k') AS BIGINT), 0)" in out
    assert "get_json_object(props, '$.a.b')" in out
    assert (
        "coalesce(CAST(array_contains(json_object_keys(props), 'k') AS INT), 0)"
        in out
    )
    # ClickHouse indices are 1-based; JSONPath is 0-based
    assert "coalesce(CAST(get_json_object(props, '$.arr[1]') AS DOUBLE), 0.0d)" in out


def test_json_edge_cases():
    """r11 ADVICE (dialect.py:164/295): dotted keys take bracket form
    (one key, not a nested path); negative indices and quoted keys
    raise instead of silently reading NULL; missing keys yield the
    ClickHouse 0/0.0/false defaults end-to-end."""
    import pytest

    out = dialect.rewrite("SELECT JSONExtractString(props, 'a.b') FROM t")
    assert "get_json_object(props, '$[\\'a.b\\']')" in out
    with pytest.raises(ValueError, match="negative"):
        dialect.rewrite("SELECT JSONExtractString(props, '-1') FROM t")
    with pytest.raises(ValueError, match="quote"):
        dialect.rewrite("SELECT JSONExtractString(props, 'a\\'b') FROM t")


def test_json_missing_key_defaults(spark):
    """Missing/mistyped keys: Int→0, Float→0.0, Bool→false, JSONHas
    sums — the ClickHouse-documented defaults, not NULL."""
    row = spark.sql(
        dialect.rewrite(
            "SELECT JSONExtractInt('{\"a\":1}', 'missing') AS i,"
            " JSONExtractFloat('{}', 'x') AS f,"
            " JSONExtractBool('{}', 'x') AS b,"
            " JSONHas('{\"a\":1}', 'a') + JSONHas('{}', 'a') AS h"
        )
    ).collect()[0]
    assert (row.i, row.f, row.b, row.h) == (0, 0.0, False, 1)


def test_json_has_null_vs_missing(spark):
    """r12 VERDICT #6 closed: JSONHas distinguishes a key holding JSON
    null (present → 1, the ClickHouse result) from a missing key (0),
    at top level and nested; malformed JSON and non-object parents
    yield 0."""
    row = spark.sql(
        dialect.rewrite(
            "SELECT JSONHas('{\"a\":null}', 'a') AS null_val,"
            " JSONHas('{\"a\":null}', 'b') AS missing,"
            " JSONHas('{\"o\":{\"x\":null}}', 'o', 'x') AS nested_null,"
            " JSONHas('{\"o\":{\"x\":null}}', 'o', 'y') AS nested_missing,"
            " JSONHas('not json', 'a') AS malformed,"
            " JSONHas('[1,2]', 'a') AS non_object"
        )
    ).collect()[0]
    assert (
        row.null_val, row.missing, row.nested_null,
        row.nested_missing, row.malformed, row.non_object,
    ) == (1, 0, 1, 0, 0, 0)


def test_json_has_array_index_existence(spark):
    """VERDICT r13 #6 closed: JSONHas(json, ..., idx) mirrors
    ClickHouse's 1-based index-EXISTENCE semantics via
    json_array_length — a null ELEMENT counts as present, out-of-range
    indices and non-array parents are 0 (the old extraction probe
    conflated null elements with absent indices)."""
    row = spark.sql(
        dialect.rewrite(
            "SELECT JSONHas('[10, null, 30]', '2') AS null_elem,"
            " JSONHas('[10, null, 30]', '3') AS in_range,"
            " JSONHas('[10, null, 30]', '4') AS out_of_range,"
            " JSONHas('{\"arr\":[null]}', 'arr', '1') AS nested_null_elem,"
            " JSONHas('{\"arr\":[null]}', 'arr', '2') AS nested_oob,"
            " JSONHas('{\"arr\":5}', 'arr', '1') AS non_array,"
            " JSONHas('not json', '1') AS malformed"
        )
    ).collect()[0]
    assert (
        row.null_elem, row.in_range, row.out_of_range,
        row.nested_null_elem, row.nested_oob, row.non_array, row.malformed,
    ) == (1, 1, 0, 1, 0, 0, 0)


def test_json_has_index_zero_is_absent(spark):
    """r14 ADVICE dialect.py:231: ClickHouse indices are 1-based, so
    JSONHas(json, 0) is 0 for EVERY array (the [i-1] translation made
    index 0 read [-1], and `json_array_length > -1` claimed presence
    on any array, empty included)."""
    row = spark.sql(
        dialect.rewrite(
            "SELECT JSONHas('[1,2]', '0') AS idx0,"
            " JSONHas('[]', '0') AS idx0_empty,"
            " JSONHas('{\"arr\":[null]}', 'arr', '0') AS nested_idx0"
        )
    ).collect()[0]
    assert (row.idx0, row.idx0_empty, row.nested_idx0) == (0, 0, 0)


def test_json_has_bracket_form_string_key(spark):
    """r13 ADVICE: a key with dots/metacharacters takes the bracket
    path form — it must still route through the json_object_keys
    presence probe, so JSONHas('{\"a.b\":null}','a.b') = 1."""
    row = spark.sql(
        dialect.rewrite(
            "SELECT JSONHas('{\"a.b\":null}', 'a.b') AS dotted_null,"
            " JSONHas('{\"a.b\":1}', 'a.b') AS dotted_present,"
            " JSONHas('{\"a\":{\"b\":1}}', 'a.b') AS not_nested,"
            " JSONHas('{\"o\":{\"k.x\":null}}', 'o', 'k.x') AS nested_dotted"
        )
    ).collect()[0]
    assert (
        row.dotted_null, row.dotted_present, row.not_nested, row.nested_dotted,
    ) == (1, 1, 0, 1)


def test_uniq_merge_rejected_loudly():
    """r12 ADVICE: uniqMerge has no correct value-level rewrite
    (distinct counts are not summable) — the shim refuses with
    guidance instead of half-translating the uniqState/uniqMerge
    pair."""
    import pytest

    with pytest.raises(ValueError, match="uniqMerge"):
        dialect.rewrite("SELECT uniqMerge(users_state) FROM mv GROUP BY d")


def test_quote_aware_whole_text_rewrites():
    """r12 ADVICE: system.* mapping (and corpus.pin_clock) are applied
    through the string-literal-skipping scanner — a literal mentioning
    'system.parts' or 'today()' survives verbatim."""
    out = dialect.rewrite(
        "SELECT query FROM system.query_log WHERE query LIKE '%system.parts%'"
    )
    assert "FROM system_query_log" in out
    assert "'%system.parts%'" in out
    from clickhouse_realtime_analytics_demo_spark.plans import corpus

    pinned = corpus.pin_clock("SELECT 'today()' AS lit, today() AS d")
    assert "'today()'" in pinned
    assert "DATE '" in pinned


def test_alias_precedence_inlining(spark):
    """r12 VERDICT #1: ClickHouse resolves SELECT-list aliases over
    same-named base columns; the dialect inlines alias expressions
    into later references so Spark computes the same thing. Pins the
    ex_2_4 shape (agg alias ÷ agg alias under GROUP BY), the ex_2_3
    guard (an agg alias referenced INSIDE another aggregate means the
    base column — never a nested aggregate), non-agg aliases reaching
    WHERE/GROUP BY, and subquery scope isolation."""
    out = dialect.rewrite(
        "SELECT country, SUM(unique_users) as unique_users,"
        " SUM(total_revenue) as revenue,"
        " round(revenue / unique_users, 2) as rpu"
        " FROM mv GROUP BY country"
    )
    assert "round((SUM(total_revenue)) / (SUM(unique_users)), 2)" in out
    out = dialect.rewrite(
        "SELECT sum(page_views) as page_views,"
        " round(sum(purchases) * 100.0 / sum(page_views), 2) as rate FROM mv"
    )
    assert "sum(sum(" not in out
    out = dialect.rewrite(
        "SELECT toDate(ts) AS d, count(*) AS c FROM e"
        " WHERE d > '2024-01-01' GROUP BY d"
    )
    assert "WHERE (to_date(ts)) > '2024-01-01'" in out
    assert "GROUP BY (to_date(ts))" in out
    out = dialect.rewrite("SELECT a AS x, (SELECT x FROM t2) AS sub, x + 1 AS y FROM t1")
    assert "(SELECT x FROM t2)" in out  # inner scope untouched
    assert "(a) + 1 AS y" in out
    # lambda params shadow aliases inside their own HOF item; outer
    # references still resolve to the alias
    out = dialect.rewrite(
        "SELECT a AS x, arrayMap(x -> x + 1, arr) AS m, x + 2 AS y FROM t"
    )
    assert "transform(arr, x -> x + 1)" in out
    assert "(a) + 2 AS y" in out
    # end-to-end: the ClickHouse resolution is what executes
    row = spark.sql(
        dialect.rewrite(
            "SELECT SUM(v) AS v, SUM(w) AS w, v / w AS ratio"
            " FROM (SELECT 10 AS v, 2 AS w UNION ALL SELECT 30 AS v, 2 AS w)"
        )
    ).collect()[0]
    assert (row.v, row.w, float(row.ratio)) == (40, 4, 10.0)


def test_alias_scalar_if_family_is_plain(spark):
    """r13 ADVICE (medium): multiIf/if/nullIf are SCALAR functions —
    a bare \\w+If in the aggregate classifier excluded their aliases
    from the `plain` map, so references in WHERE/GROUP BY were not
    inlined and references inside aggregates silently resolved to a
    same-named base column. Aggregate -If combinators (sumIf, countIf)
    must still classify as aggregates."""
    out = dialect.rewrite(
        "SELECT multiIf(a > 1, 'hi', 'lo') AS band, count(*) AS c"
        " FROM t WHERE band != 'lo' GROUP BY band"
    )
    assert "WHERE ((CASE WHEN" in out and "GROUP BY ((CASE WHEN" in out
    # inside an aggregate, a scalar alias EXPANDS (never base-column)
    out = dialect.rewrite(
        "SELECT nullIf(v, 0) AS nv, sum(nv) AS s FROM t GROUP BY k"
    )
    assert "sum((nullIf(v, 0)))" in out
    # aggregate -If combinators keep aggregate classification: the
    # alias must NOT be inlined into WHERE (ClickHouse-illegal there)
    out = dialect.rewrite(
        "SELECT sumIf(v, v > 0) AS pos FROM t WHERE pos > 1 GROUP BY k"
    )
    assert "WHERE pos > 1" in out
    # end-to-end: the ClickHouse resolution executes
    row = spark.sql(
        dialect.rewrite(
            "SELECT multiIf(v > 15, 'big', 'small') AS band, sum(v) AS s"
            " FROM (SELECT 10 AS v UNION ALL SELECT 20 AS v)"
            " WHERE band = 'big' GROUP BY band"
        )
    ).collect()
    assert [(r.band, r.s) for r in row] == [("big", 20)]


def test_alias_named_window_not_plain():
    """r13 ADVICE: an alias over a NAMED window (`... OVER w` with a
    WINDOW clause) is window-bearing — it must not be inlined into
    WHERE/GROUP BY (invalid scope), same as the `OVER (...)` form."""
    out = dialect.rewrite(
        "SELECT row_number() OVER w AS rn, v FROM t"
        " WHERE rn <= 3 WINDOW w AS (ORDER BY v)"
    )
    assert "WHERE rn <= 3" in out  # untouched: alias not in `plain`
    # identifiers merely STARTING with 'over' are not window-bearing
    out = dialect.rewrite(
        "SELECT overflow + 1 AS x, v FROM t WHERE x > 2"
    )
    assert "WHERE (overflow + 1) > 2" in out


def test_json_gateway_end_to_end(spark):
    """ClickHouse-dialect JSON SQL through the gateway, value-checked
    against DuckDB's json functions on the same parquet files."""
    catalog.register(spark, SF_DIR)
    got = gateway.execute(
        spark,
        "SELECT event_type, sum(JSONExtractInt(props, 'k')) AS sum_k,"
        " countIf(JSONHas(props, 'k')) AS with_k"
        " FROM events GROUP BY event_type ORDER BY event_type",
    ).df
    srows = normalize([tuple(r) for r in got.collect()], got.columns)
    con = duck_connection(SF_DIR)
    drows = con.sql(
        "SELECT event_type,"
        " CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,"
        " CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS with_k"
        " FROM events GROUP BY event_type ORDER BY event_type"
    ).fetchall()
    assert srows == normalize(drows, ["event_type", "sum_k", "with_k"])


def test_array_hof_rewrites():
    out = dialect.rewrite(
        "SELECT arrayMap(x -> x * 2, arr), arrayFilter(x -> x != '', arr),"
        " arrayExists(x -> x > 3, arr), arrayAll(x -> x > 0, arr),"
        " arrayCount(x -> x = 1, arr), arrayCount(arr),"
        " arrayFirst(x -> x > 9, arr) FROM t"
    )
    assert "transform(arr, x -> x * 2)" in out
    assert "filter(arr, x -> x != '')" in out
    assert "exists(arr, x -> x > 3)" in out
    assert "forall(arr, x -> x > 0)" in out
    assert "size(filter(arr, x -> x = 1))" in out
    assert "size(filter(arr, x -> x != 0))" in out
    assert "element_at(filter(arr, x -> x > 9), 1)" in out


def test_array_hof_multi_array_forms(spark):
    """r11 ADVICE (dialect.py:260): ClickHouse's 2-array arrayMap maps
    to zip_with (exact twin, value-checked); every other multi-array
    HOF raises instead of silently dropping arrays."""
    import pytest

    out = dialect.rewrite(
        "SELECT arrayMap((x, y) -> x + y, array(1, 2), array(10, 20)) AS s"
    )
    assert "zip_with(array(1, 2), array(10, 20), (x, y) -> x + y)" in out
    assert spark.sql(out).collect()[0].s == [11, 22]
    for bad in (
        "SELECT arrayMap((x,y,z) -> x, a, b, c) FROM t",
        "SELECT arrayFilter((x,y) -> x > y, a, b) FROM t",
        "SELECT arrayExists((x,y) -> x > y, a, b) FROM t",
        "SELECT arrayCount((x,y) -> x > y, a, b) FROM t",
    ):
        with pytest.raises(ValueError, match="array"):
            dialect.rewrite(bad)


def test_parametric_aggregate_rewrites():
    """r12: ClickHouse's two-group parametric form name(params)(args)
    (sql-reference parametric-functions) — quantile*/quantiles* fold
    into percentile (exact) / approx_percentile (TDigest sketch),
    uniqUpTo(N) is exactly expressible, topK(k) raises with guidance
    instead of emitting unparseable SQL."""
    import pytest

    out = dialect.rewrite(
        "SELECT quantile(0.5)(x), quantiles(0.25, 0.9)(x),"
        " quantileTDigest(0.95)(x), uniqUpTo(10)(u) FROM t"
    )
    assert "percentile(x, 0.5)" in out
    assert "percentile(x, array(0.25, 0.9))" in out
    assert "approx_percentile(x, 0.95)" in out
    assert "least(count(DISTINCT u), 10 + 1)" in out
    # the bare (non-parametric) median form is untouched by the new path
    assert "percentile(x, 0.5)" in dialect.rewrite("SELECT quantile(x) FROM t")
    with pytest.raises(ValueError, match="topK"):
        dialect.rewrite("SELECT topK(5)(u) FROM t")


def test_parametric_quantile_gateway_end_to_end(spark):
    """quantile(p)(x) / quantiles(...)(x) / uniqUpTo through the
    gateway, value-checked against DuckDB's quantile_cont on the same
    parquet (both sides exact interpolated percentiles)."""
    catalog.register(spark, SF_DIR)
    got = gateway.execute(
        spark,
        "SELECT o_orderstatus AS status,"
        " round(quantile(0.5)(o_totalprice), 4) AS p50,"
        " round(arrayElement(quantiles(0.25, 0.9)(o_totalprice), 2), 4) AS p90,"
        " uniqUpTo(3)(o_orderpriority) AS prio_upto3"
        " FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
    ).df
    srows = [tuple(r) for r in got.collect()]
    con = duck_connection(SF_DIR)
    drows = con.sql(
        "SELECT o_orderstatus AS status,"
        " round(quantile_cont(o_totalprice, 0.5), 4) AS p50,"
        " round(quantile_cont(o_totalprice, 0.9), 4) AS p90,"
        " least(count(DISTINCT o_orderpriority), 4) AS prio_upto3"
        " FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"
    ).fetchall()
    assert len(srows) == len(drows)
    for s, d in zip(srows, drows):
        assert s[0] == d[0]
        assert abs(float(s[1]) - float(d[1])) < 1e-6, (s, d)
        assert abs(float(s[2]) - float(d[2])) < 1e-6, (s, d)
        assert int(s[3]) == int(d[3])


def test_position_start_pos(spark):
    """r11 ADVICE (dialect.py:260): 3-arg position(haystack, needle,
    start_pos) maps to locate(needle, haystack, pos) — previously the
    start was silently dropped."""
    out = dialect.rewrite(
        "SELECT position('abcabc', 'b', 3) AS p,"
        " positionCaseInsensitive('ABCabc', 'B', 3) AS pi"
    )
    assert "locate('b', 'abcabc', 3)" in out
    row = spark.sql(out).collect()[0]
    assert (row.p, row.pi) == (5, 5)


def test_array_hof_gateway_end_to_end(spark):
    """ClickHouse lambda-first HOFs through the gateway vs DuckDB's
    list functions on the same documents parquet — integer outputs so
    equality is exact."""
    catalog.register(spark, SF_DIR)
    got = gateway.execute(
        spark,
        "SELECT lang,"
        " sum(arrayCount(x -> x != '', splitByChar(' ', text))) AS words,"
        " sum(if(arrayExists(x -> lengthUTF8(x) > 8, splitByChar(' ', text)), 1, 0))"
        "   AS docs_with_long_word"
        " FROM documents WHERE text IS NOT NULL GROUP BY lang ORDER BY lang",
    ).df
    srows = normalize([tuple(r) for r in got.collect()], got.columns)
    con = duck_connection(SF_DIR)
    drows = con.sql(
        "SELECT lang,"
        " CAST(SUM(length(list_filter(string_split(text, ' '), x -> x != ''))) AS BIGINT) AS words,"
        " CAST(SUM(CASE WHEN length(list_filter(string_split(text, ' '), x -> length(x) > 8)) > 0"
        "      THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_long_word"
        " FROM documents WHERE text IS NOT NULL GROUP BY lang ORDER BY lang"
    ).fetchall()
    assert srows == normalize(drows, ["lang", "words", "docs_with_long_word"])


def test_scalar_string_date_rewrites():
    out = dialect.rewrite(
        "SELECT toYear(ts), toQuarter(ts), toMonth(ts), toDayOfMonth(ts),"
        " toDayOfWeek(ts), toMinute(ts), toSecond(ts),"
        " position(name, 'abc'), positionCaseInsensitive(name, 'ABC'),"
        " startsWith(name, 'a'), endsWith(name, 'z'), trimBoth(name),"
        " leftPad(name, 5, ' '), concatWithSeparator('-', a, b),"
        " replaceAll(name, 'x', 'y'), replaceRegexpAll(name, '[0-9]', '#')"
        " FROM t"
    )
    for frag in (
        "year(ts)", "quarter(ts)", "month(ts)", "day(ts)",
        "(((dayofweek(ts) + 5) % 7) + 1)", "minute(ts)", "second(ts)",
        "instr(name, 'abc')", "instr(lower(name), lower('ABC'))",
        "startswith(name, 'a')", "endswith(name, 'z')", "trim(name)",
        "lpad(name, 5, ' ')", "concat_ws('-', a, b)",
        "replace(name, 'x', 'y')", "regexp_replace(name, '[0-9]', '#')",
    ):
        assert frag in out, (frag, out)


def test_scalar_gateway_end_to_end(spark):
    """ClickHouse scalar forms through the gateway vs DuckDB —
    notably toDayOfWeek's Monday=1 convention (DuckDB isodow twin)
    and 1-based position()."""
    catalog.register(spark, SF_DIR)
    got = gateway.execute(
        spark,
        "SELECT toDayOfWeek(ts) AS dow, count() AS events,"
        " countIf(position(event_type, 'a') > 0) AS with_a"
        " FROM events GROUP BY dow ORDER BY dow",
    ).df
    srows = normalize([tuple(r) for r in got.collect()], got.columns)
    con = duck_connection(SF_DIR)
    drows = con.sql(
        "SELECT CAST(isodow(ts) AS INT) AS dow, COUNT(*) AS events,"
        " CAST(SUM(CASE WHEN strpos(event_type, 'a') > 0 THEN 1 ELSE 0 END) AS BIGINT) AS with_a"
        " FROM events GROUP BY dow ORDER BY dow"
    ).fetchall()
    assert srows == normalize(drows, ["dow", "events", "with_a"])
