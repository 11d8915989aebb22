"""Cluster-resolution queries: near-dup pair graph → connected
components → keep-one-per-cluster (operators/graph.py).

Registered AFTER every other query module (see ``registry.
all_queries``): the driver's correctness record holds exactly the
first 50 registered queries, and those 50 slots are locked — the
oracle entry here takes slot 51+, gated by the same local DuckDB
comparison in tests/test_correctness.py instead (the recursive-CTE
transitive closure below IS a full independent implementation of
connected components, so the local gate is as strong as a driver
slot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.catalog import table
from clickhouse_realtime_analytics_demo_spark.operators import dedup, graph
from clickhouse_realtime_analytics_demo_spark.queries.registry import register


@register(
    "dedup_cluster_resolution",
    # Independent oracle: pair generation identical to the
    # ngram_jaccard_sample oracle; components via recursive-CTE
    # transitive closure (min reachable id), a completely different
    # algorithm from the star contraction under test.
    oracle="""
    WITH RECURSIVE grams AS (
        SELECT doc_id, source,
               list_distinct(list_transform(
                   generate_series(1, GREATEST(length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) - 2, 1)),
                   i -> substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), CAST(i AS INTEGER), 3)
               )) AS sh
        FROM documents WHERE doc_id < 120
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM grams a JOIN grams b ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE CAST(length(list_intersect(a.sh, b.sh)) AS DOUBLE)
                / CAST(length(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.3
    ),
    sym AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    reach(a, b) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    )
    SELECT a AS id, LEAST(a, MIN(b)) AS component
    FROM reach GROUP BY a ORDER BY id
    """,
)
def dedup_cluster_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (exact char-3-gram Jaccard ≥ 0.3, source-blocked)
    resolved into clusters by Large-Star/Small-Star contraction —
    ``component`` is the min doc_id of each cluster, the id the
    keep-one policy retains.
    """
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.3, n=3, block_col="source")
    return graph.connected_components(pairs).orderBy("id")


@register("dedup_minhash_keep_one")  # rows-only: xxhash64 MinHash pairs
def dedup_minhash_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-dedup pipeline end to end: MinHash-LSH pairs →
    components → drop non-representatives. One summary row
    (total/survivors/dropped) — the number a pipeline operator reads
    to see the dedup savings."""
    docs = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(docs, threshold=0.7)
    kept = graph.keep_one_per_cluster(docs, pairs)
    total = docs.count()
    survivors = kept.count()
    return spark.createDataFrame(
        [(total, survivors, total - survivors)],
        "total_docs long, survivors long, dropped long",
    )
