"""SemDeDup-style semantic dedup (r11): k-means cluster-confined
embedding near-dup pairs + keep-one resolution. The published recipe
(Abbas et al. 2023) bounds pairwise work at Σ cluster² instead of N² —
the semantic analog of the LSH bucket. Ground truth: the same planted
near-dup set `embedding_near_dups` uses (copies of vec_id 0..4 at
id+1_000_000, cosine ≥ 0.9999).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.operators import similarity
from clickhouse_realtime_analytics_demo_spark.queries import all_queries
from clickhouse_realtime_analytics_demo_spark.queries.llmops import _planted_corpus
from tests.conftest import SF_DIR

PLANTED = {(i, i + 1_000_000) for i in range(5)}


def test_semantic_pairs_find_planted_dups(spark):
    corpus = _planted_corpus(spark, SF_DIR)
    pairs = {
        (r.id_a, r.id_b)
        for r in similarity.semantic_dedup_pairs(corpus, threshold=0.95).collect()
    }
    # every planted (original, copy) pair shares a cluster — a 5e-4
    # perturbation cannot flip a nearest-centroid argmax unless the
    # original sits on a cell boundary — and clears the 0.95 gate
    assert pairs >= PLANTED
    # random 64-dim vectors produce no 0.95-cosine collisions: the
    # planted set is EXACTLY the result (no false positives)
    assert pairs == PLANTED


def test_cluster_cap_valve(spark):
    corpus = _planted_corpus(spark, SF_DIR)
    # a cap below every cluster size drops all pair generation — the
    # same drop-valve contract as dedup.py's max_bucket_size
    assert (
        similarity.semantic_dedup_pairs(corpus, threshold=0.95, max_cluster_size=1).count()
        == 0
    )
    # a cap above every cluster size behaves exactly like no cap
    n = corpus.count()
    a = similarity.semantic_dedup_pairs(corpus, threshold=0.95, max_cluster_size=n)
    b = similarity.semantic_dedup_pairs(corpus, threshold=0.95)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_semantic_dedup_query_summary(spark):
    row = all_queries()["semantic_dedup"].fn(spark, SF_DIR).collect()[0]
    assert row["dup_pairs"] == len(PLANTED)
    assert row["removed_vecs"] == 5  # one non-representative per planted pair
    assert row["kept_vecs"] == row["n_vecs"] - 5
    # keep-one keeps the MIN id: the originals survive, the copies go
    corpus = _planted_corpus(spark, SF_DIR)
    from clickhouse_realtime_analytics_demo_spark.operators import graph

    pairs = similarity.semantic_dedup_pairs(corpus, threshold=0.95)
    kept_ids = {
        r.vec_id
        for r in graph.keep_one_per_cluster(corpus, pairs, id_col="vec_id")
        .filter((F.col("vec_id") < 5) | (F.col("vec_id") >= 1_000_000))
        .collect()
    }
    assert kept_ids == {0, 1, 2, 3, 4}
