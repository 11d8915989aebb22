"""Deterministic sampling operators (operators/sampling.py).

The contract under test is REPRODUCIBILITY: membership is a pure
function of (key, seed) — identical at any partitioning, identical in
another engine (DuckDB recomputes the exact member set from the same
md5 formula) — plus statistical sanity of the rates and exact-k for
the reservoir.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.catalog import table
from clickhouse_realtime_analytics_demo_spark.operators import sampling
from clickhouse_realtime_analytics_demo_spark.queries import all_queries

from tests.conftest import SF_DIR_MID, duck_connection


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_membership_layout_independent(spark):
    docs = table(spark, SF_DIR_MID, "documents")
    a = _ids(sampling.sample_hash(docs.repartition(1), "doc_id", 0.2, seed="t"))
    b = _ids(sampling.sample_hash(docs.repartition(13), "doc_id", 0.2, seed="t"))
    assert a == b and len(a) > 0
    # a different seed draws a different set
    c = _ids(sampling.sample_hash(docs, "doc_id", 0.2, seed="t2"))
    assert c != a


def test_membership_matches_duckdb_exactly(spark):
    """The whole point of md5-prefix membership: another engine can
    recompute the member set bit-for-bit."""
    thr = sampling.fraction_threshold(0.2)
    got = _ids(sampling.sample_hash(table(spark, SF_DIR_MID, "documents"), "doc_id", 0.2, seed="t"))
    con = duck_connection(SF_DIR_MID)
    want = [
        r[0]
        for r in con.sql(
            "SELECT doc_id FROM documents "
            f"WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':t'), 1, 15) < '{thr}' "
            "ORDER BY doc_id"
        ).fetchall()
    ]
    assert got == want


def test_fraction_statistics(spark):
    docs = table(spark, SF_DIR_MID, "documents")
    n = docs.count()
    k = sampling.sample_hash(docs, "doc_id", 0.3, seed="stat").count()
    # binomial: allow 5 sigma around 0.3n
    import math

    sigma = math.sqrt(n * 0.3 * 0.7)
    assert abs(k - 0.3 * n) <= 5 * sigma


def test_stratified_rates_and_default(spark):
    docs = table(spark, SF_DIR_MID, "documents")
    s = sampling.sample_stratified(
        docs, "lang", {"en": 1.0, "zh": 0.0}, key_col="doc_id", seed="t",
        default_fraction=0.5,
    )
    by_lang = {r.lang: r.n for r in s.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang["en"] == totals["en"]  # fraction 1.0 keeps all
    assert "zh" not in by_lang  # fraction 0.0 keeps none
    for lang in ("de", "es", "fr"):  # default 0.5 within 5 sigma
        import math

        n = totals[lang]
        assert abs(by_lang[lang] - 0.5 * n) <= 5 * math.sqrt(n * 0.25)


def test_reservoir_exact_k_and_stability(spark):
    docs = table(spark, SF_DIR_MID, "documents")
    a = _ids(sampling.sample_reservoir(docs.repartition(1), 37, "doc_id", seed="t"))
    b = _ids(sampling.sample_reservoir(docs.repartition(7), 37, "doc_id", seed="t"))
    assert len(a) == 37 and a == b
    # append-stable: adding rows that hash higher never displaces winners
    more = docs.withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
    c = _ids(sampling.sample_reservoir(docs.unionByName(more), 37, "doc_id", seed="t"))
    assert set(a) <= set(_ids(docs.select("doc_id"))) and len(c) == 37


def test_reservoir_plan_is_take_ordered(spark):
    docs = table(spark, SF_DIR_MID, "documents")
    plan = (
        sampling.sample_reservoir(docs, 10, "doc_id", seed="t")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan  # distributed top-k, no global sort


def test_invalid_args(spark):
    docs = table(spark, SF_DIR_MID, "documents")
    with pytest.raises(ValueError, match="fraction"):
        sampling.sample_hash(docs, "doc_id", 1.5)
    with pytest.raises(ValueError, match="k must be positive"):
        sampling.sample_reservoir(docs, 0, "doc_id")


def test_registry_query_runs_and_matches_duckdb(spark):
    """doc_sample_stratified is rows-only on the driver record (the 50
    oracle slots are full) — assert its exact DuckDB twin here."""
    df = all_queries()["doc_sample_stratified"].fn(spark, SF_DIR_MID)
    got = sorted(tuple(r) for r in df.collect())
    rates = {"en": 0.25, "de": 0.5, "es": 0.5, "fr": 0.5, "zh": 0.5}
    cases = " ".join(
        f"WHEN '{lang}' THEN '{sampling.fraction_threshold(f)}'" for lang, f in rates.items()
    )
    con = duck_connection(SF_DIR_MID)
    want = sorted(
        tuple(r)
        for r in con.sql(
            "SELECT lang, COUNT(*) AS docs, SUM(n_chars) AS chars, "
            "MIN(doc_id) AS min_doc_id FROM documents "
            "WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':r5'), 1, 15) "
            f"< (CASE lang {cases} ELSE '{sampling.fraction_threshold(0.0)}' END) "
            "GROUP BY lang ORDER BY lang"
        ).fetchall()
    )
    assert got == want and len(got) == 5


def test_split_hash_disjoint_exhaustive_and_consistent(spark):
    docs = table(spark, SF_DIR_MID, "documents")
    n = docs.count()
    s = sampling.split_hash(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed="t")
    by = {r.split: r.n for r in s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(by.values()) == n and set(by) == {"train", "val", "test"}
    import math

    for name, w in (("train", 0.8), ("val", 0.1), ("test", 0.1)):
        assert abs(by[name] - w * n) <= 5 * math.sqrt(n * w * (1 - w)), (name, by)
    # consistency with sample_hash: the train split IS the 0.8 sample
    train_ids = sorted(r.doc_id for r in s.filter(F.col("split") == "train").collect())
    assert train_ids == _ids(sampling.sample_hash(docs, "doc_id", 0.8, seed="t"))
    # layout-independent
    s13 = sampling.split_hash(
        docs.repartition(13), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed="t"
    )
    t13 = sorted(r.doc_id for r in s13.filter(F.col("split") == "train").collect())
    assert t13 == train_ids
    with pytest.raises(ValueError, match="sum to 1"):
        sampling.split_hash(docs, "doc_id", {"a": 0.5, "b": 0.6})


def test_null_key_policy_uniform(spark):
    """NULL keys are excluded by every operator — never silently
    routed to the remainder split (r5 ADVICE): split/sample/reservoir
    must agree so 'the train split IS the 0.8 sample' stays exact."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (None, "a"), (3, "b"), (None, "b")],
        "k long, g string",
    )
    assert sampling.sample_hash(df, "k", 1.0, seed="n").count() == 3
    assert sampling.sample_stratified(df, "g", {"a": 1.0, "b": 1.0}, "k", seed="n").count() == 3
    labeled = sampling.split_hash(df, "k", {"train": 0.8, "test": 0.2}, seed="n")
    assert labeled.count() == 3 and labeled.filter(F.col("k").isNull()).count() == 0
    # reservoir: NULL keys must not crowd out real winners via NULLS FIRST
    res = sampling.sample_reservoir(df, k=5, key_col="k", seed="n").collect()
    assert sorted(r.k for r in res) == [1, 2, 3]
    # consistency contract: train split == fraction-0.8 sample, exactly
    train = {r.k for r in labeled.filter(F.col("split") == "train").collect()}
    samp = {r.k for r in sampling.sample_hash(df, "k", 0.8, seed="n").collect()}
    assert train == samp
