"""Scale-safe RFM (VERDICT round 2 #3) + the exact-ranking operator.

- ``exact_global_ranks`` must equal the unpartitioned-window
  row_number on adversarial data (ties, skew, negatives).
- ``ntile_from_rank`` must equal SQL NTILE for every (n, k) shape.
- ``user_rfm`` stays oracle-green (bit-identical to the NTILE
  oracle) while its physical plan contains NO unpartitioned
  WindowExec.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.operators.ranking import (
    exact_global_ranks,
    ntile_from_rank,
)
from clickhouse_realtime_analytics_demo_spark.queries import all_queries

from tests.conftest import compare_with_oracle


def _walk(node):
    yield node
    for i in range(node.children().size()):
        yield from _walk(node.children().apply(i))


def unpartitioned_window_count(df) -> int:
    """Count WindowExec nodes with an empty partitionSpec in the
    executed plan (the single-task global sort the verdict flags)."""
    plan = df._jdf.queryExecution().executedPlan()
    n = 0
    for node in _walk(plan):
        if node.getClass().getSimpleName() == "WindowExec" and node.partitionSpec().isEmpty():
            n += 1
    return n


def test_exact_ranks_match_global_window(spark):
    # adversarial: heavy ties (k=1.0), negatives, one dominant value
    rows = [
        ("a", float(v), uid)
        for uid, v in enumerate([1.0] * 40 + [-3.5] * 7 + list(range(50)) + [2.25, 2.25])
    ] + [("b", float(-(uid % 13)), uid) for uid in range(97)]
    df = spark.createDataFrame(rows, "kind string, k double, uid long").repartition(8)
    ranked = exact_global_ranks(df, num_buckets=5).collect()
    got = {(r.kind, r.uid): r.rank for r in ranked}
    want_df = df.withColumn(
        "rank", F.row_number().over(Window.partitionBy("kind").orderBy("k", "uid"))
    )
    want = {(r.kind, r.uid): r.rank for r in want_df.collect()}
    assert got == want
    assert {(r.kind, r.n) for r in ranked} == {("a", 99), ("b", 97)}


def test_tied_mass_deskew(spark):
    """A 90%-tied key must NOT collapse into one bucket (VERDICT r3
    Next #2): the tied run is sub-split on uid-ranges, so the max
    bucket stays near n/num_buckets — while ranks remain exact."""
    n, buckets = 2_000, 8
    # 90% of rows tie at k=7.0; the rest are distinct values
    rows = [
        ("a", 7.0 if uid % 10 else float(uid) / n, uid) for uid in range(n)
    ]
    df = spark.createDataFrame(rows, "kind string, k double, uid long").repartition(8)
    ranked = exact_global_ranks(
        df, num_buckets=buckets, keep_bucket=True
    ).collect()

    # exactness under heavy ties
    got = {r.uid: r.rank for r in ranked}
    want = {
        r.uid: r.rank
        for r in df.withColumn(
            "rank", F.row_number().over(Window.partitionBy("kind").orderBy("k", "uid"))
        ).collect()
    }
    assert got == want

    # balance: no bucket holds more than ~2x the fair share (the old
    # behavior put all 1,800 tied rows in ONE bucket)
    sizes: dict[int, int] = {}
    for r in ranked:
        sizes[r._bucket] = sizes.get(r._bucket, 0) + 1
    fair = n / buckets
    assert max(sizes.values()) <= 2 * fair, sizes
    assert len(sizes) >= buckets - 1, sizes


def test_non_numeric_uid_rejected(spark):
    """r4 ADVICE: a string uid would silently produce wrong ranks
    (string sort order diverges from the double-grid comparisons of
    the tie sub-split) — the operator must refuse at entry."""
    df = spark.createDataFrame(
        [("a", 1.0, "u1"), ("a", 1.0, "u2")], "kind string, k double, uid string"
    )
    with pytest.raises(TypeError, match="must be numeric"):
        exact_global_ranks(df)


def test_ntile_from_rank_matches_sql_ntile(spark):
    for n in (1, 4, 5, 6, 23, 100):
        for k in (3, 5, 7):
            df = spark.range(1, n + 1).withColumnRenamed("id", "rank")
            got = [
                r.b
                for r in df.select(ntile_from_rank(F.col("rank"), n, k).alias("b"))
                .orderBy("rank")
                .collect()
            ]
            want = [
                r.b
                for r in spark.range(1, n + 1)
                .select(F.ntile(k).over(Window.orderBy("id")).alias("b"))
                .collect()
            ]
            assert got == want, f"n={n} k={k}: {got} != {want}"


def test_user_rfm_oracle_still_green(spark):
    compare_with_oracle(spark, "user_rfm")


def test_supplier_rankings_oracle_still_green(spark):
    compare_with_oracle(spark, "supplier_rankings")


@pytest.mark.parametrize("name", ["user_rfm", "supplier_rankings"])
def test_plan_has_no_unpartitioned_window(spark, name):
    df = all_queries()[name].fn(spark, "/root/testdata/sf0.001")
    assert unpartitioned_window_count(df) == 0
