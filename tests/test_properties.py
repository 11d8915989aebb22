"""Property-based tests (hypothesis): dialect rewrite invariants and
gap-session partition laws on randomized inputs."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhouse_realtime_analytics_demo_spark.plans import dialect

# ------------------------------------------------------------- dialect

_ident = st.from_regex(r"[a-z_][a-z0-9_]{0,10}", fullmatch=True)


@given(_ident, _ident)
def test_rewrite_idempotent_on_plain_sql(col, tab):
    sql = f"SELECT {col} FROM {tab} WHERE {col} > 1 ORDER BY {col}"
    assert dialect.rewrite(sql) == sql


@given(st.text(alphabet=st.characters(blacklist_characters="'\\"), max_size=40))
def test_string_literals_never_rewritten(s):
    sql = f"SELECT uniq(x), '{s}' AS lit FROM t"
    out = dialect.rewrite(sql)
    assert f"'{s}'" in out
    assert "approx_count_distinct(x)" in out


@given(st.integers(min_value=0, max_value=10_000))
def test_numbers_rewrite_any_n(n):
    out = dialect.rewrite(f"SELECT number FROM numbers({n})")
    assert f"range({n})" in out and "numbers" not in out


@given(st.lists(st.sampled_from(["toDate(a)", "uniq(b)", "countIf(c > 1)", "now()"]),
                min_size=1, max_size=4))
def test_rewrite_composes_across_select_list(calls):
    out = dialect.rewrite(f"SELECT {', '.join(calls)} FROM t")
    for bad in ("toDate(", "uniq(", "countIf(", "now()"):
        assert bad not in out


# --------------------------------------------------------- gap sessions


@settings(deadline=None, max_examples=10, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # user_id
            st.integers(min_value=0, max_value=500),  # minutes offset
        ),
        min_size=1,
        max_size=40,
    )
)
def test_gap_sessions_partition_laws(spark, rows):
    """Sessions partition each user's events; intra-session gaps are
    <= threshold, inter-session gaps are > threshold."""
    from clickhouse_realtime_analytics_demo_spark.streaming.sessions import gap_sessions

    t0 = dt.datetime(2024, 1, 1)
    data = [(u, t0 + dt.timedelta(minutes=m)) for u, m in rows]
    df = spark.createDataFrame(data, "user_id long, ts timestamp")
    sessions = gap_sessions(df, gap_minutes=30).collect()

    per_user_events: dict[int, list[dt.datetime]] = {}
    for u, ts in data:
        per_user_events.setdefault(u, []).append(ts)

    by_user: dict[int, list] = {}
    for s in sessions:
        by_user.setdefault(s.user_id, []).append(s)
    for u, evs in per_user_events.items():
        ss = sorted(by_user[u], key=lambda s: s.session_start)
        # partition: session event counts sum to the user's events
        assert sum(s.n_events for s in ss) == len(evs)
        # ordering + gap law between consecutive sessions
        for a, b in zip(ss, ss[1:]):
            assert a.session_end < b.session_start
            assert (b.session_start - a.session_end) > dt.timedelta(minutes=30)
        # bounds: starts/ends are real event times
        evset = set(evs)
        for s in ss:
            assert s.session_start in evset and s.session_end in evset


# ---------------------------------------------------- distributed ranking


@settings(deadline=None, max_examples=8, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),  # kind
            st.integers(min_value=-5, max_value=5),  # key (dense -> ties)
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=2, max_value=7),  # num_buckets
)
def test_exact_ranks_law(spark, rows, buckets):
    """exact_global_ranks == row_number over (kind order by k, uid)
    for ANY data (dense keys force ties) and ANY bucket count."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from clickhouse_realtime_analytics_demo_spark.operators.ranking import exact_global_ranks

    data = [(kind, float(k), uid) for uid, (kind, k) in enumerate(rows)]
    df = spark.createDataFrame(data, "kind string, k double, uid long").repartition(4)
    got = {
        (r.kind, r.uid): r.rank
        for r in exact_global_ranks(df, num_buckets=buckets).collect()
    }
    want = {
        (r.kind, r.uid): r.rank
        for r in df.withColumn(
            "rank", F.row_number().over(Window.partitionBy("kind").orderBy("k", "uid"))
        ).collect()
    }
    assert got == want


@settings(deadline=None, max_examples=12, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=1, max_value=300),  # n
    st.integers(min_value=1, max_value=12),  # k
)
def test_ntile_arithmetic_law(spark, n, k):
    """ntile_from_rank (pure arithmetic) == SQL NTILE for any (n, k)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from clickhouse_realtime_analytics_demo_spark.operators.ranking import ntile_from_rank

    df = spark.range(1, n + 1).withColumnRenamed("id", "rank")
    got = [
        r.b
        for r in df.select("rank", ntile_from_rank(F.col("rank"), n, k).alias("b"))
        .orderBy("rank")
        .collect()
    ]
    want = [
        r.b
        for r in spark.range(1, n + 1)
        .select(F.ntile(k).over(Window.orderBy("id")).alias("b"))
        .collect()
    ]
    assert got == want


# ------------------------------------------------- Misra-Gries summaries

@given(
    st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=2_000),
    st.integers(min_value=1, max_value=32),
    st.integers(min_value=1, max_value=257),
)
@settings(deadline=None, max_examples=40)
def test_mg_trim_laws_random_streams(vals, counters, batch):
    """The two Misra-Gries invariants on arbitrary integer streams at
    arbitrary batch sizes: (1) every reported weight is a lower bound
    undercounting by at most N/(counters+1); (2) every key with true
    count above that threshold survives. Keys drawn from a small
    domain so collisions and trims actually happen."""
    import pandas as pd

    from clickhouse_realtime_analytics_demo_spark.operators import sketches

    stream = [f"k{v}" for v in vals]
    counts: dict = {}
    for i in range(0, len(stream), batch):
        s = pd.Series(stream[i : i + batch]).value_counts()
        counts = sketches._mg_merge_trim(counts, s, counters)
    truth: dict = {}
    for k in stream:
        truth[k] = truth.get(k, 0) + 1
    bound = len(stream) / (counters + 1.0)
    assert len(counts) <= counters
    for k, w in counts.items():
        assert w <= truth[k]
        assert truth[k] - w <= bound
    for k, c in truth.items():
        if c > bound:
            assert k in counts
