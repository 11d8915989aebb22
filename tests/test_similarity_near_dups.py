"""embedding_near_dups evidence (VERDICT round 2 #4).

- the planted near-dup pairs make the operator demonstrably fire
  (non-zero output on the driver testdata),
- pair recall vs an exhaustive brute-force baseline (mirrors
  tests/test_similarity_ivf.py's recall-vs-exact pattern),
- the max_bucket_size valve caps degenerate quadratic buckets.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.operators import similarity
from clickhouse_realtime_analytics_demo_spark.queries import all_queries

from tests.conftest import SF_DIR


def test_planted_pairs_fire(spark):
    rows = all_queries()["embedding_near_dups"].fn(spark, SF_DIR).collect()
    assert len(rows) >= 5
    planted = {(i, i + 1_000_000) for i in range(5)}
    assert planted <= {(r.id_a, r.id_b) for r in rows}
    assert all(r.cosine_sim >= 0.95 for r in rows)


def test_recall_vs_brute_force(spark):
    """Every pair the exhaustive O(n²) scan finds at the threshold
    must be found by the LSH-blocked operator (planted copies differ
    by ≤5e-4 relative noise, so their sign signatures match)."""
    from clickhouse_realtime_analytics_demo_spark.catalog import table

    fn = all_queries()["embedding_near_dups"].fn
    got = {(r.id_a, r.id_b) for r in fn(spark, SF_DIR).collect()}

    emb = {r.vec_id: list(r.embedding) for r in table(spark, SF_DIR, "embeddings").collect()}
    for i in range(5):
        # reproduce the planted perturbation: deterministic per-component
        src = emb[i]
        planted_rows = (
            spark.createDataFrame([(i,)], "vec_id long")
            .select(
                F.transform(
                    F.lit(src).cast("array<double>"),
                    lambda x, j: x
                    * (
                        F.lit(1.0)
                        + (F.pmod(F.xxhash64(F.lit(i + 1_000_000), j, F.lit(99)), F.lit(1000)) - 500)
                        * F.lit(1e-6)
                    ),
                )
                .cast("array<float>")
                .alias("v")
            )
            .collect()
        )
        emb[i + 1_000_000] = list(planted_rows[0].v)

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    ids = sorted(emb)
    want = {
        (a, b)
        for ai, a in enumerate(ids)
        for b in ids[ai + 1 :]
        if cos(emb[a], emb[b]) >= 0.95
    }
    assert want, "brute force found no pairs — planted fixture broken"
    missed = want - got
    assert not missed, f"LSH-blocked operator missed {len(missed)}/{len(want)} pairs: {missed}"


def test_max_bucket_size_caps_degenerate_buckets(spark):
    base = [1.0] * 16
    rows = [(i, [x * (1 + i * 1e-7) for x in base]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    uncapped = similarity.cosine_near_dup_pairs(
        df, threshold=0.95, dim=16, max_bucket_size=None
    ).count()
    assert uncapped == 50 * 49 // 2  # one mega-bucket, quadratic
    capped = similarity.cosine_near_dup_pairs(
        df, threshold=0.95, dim=16, max_bucket_size=10
    ).count()
    assert capped == 0  # bucket dropped before the self-join
