"""MinHash-LSH bucket-size cap: mega-buckets are excluded from
candidate generation; small buckets are unaffected."""

from __future__ import annotations

from clickhouse_realtime_analytics_demo_spark.operators import dedup


def _docs(spark):
    # 6 identical boilerplate docs (one mega-bucket in every band) and
    # 2 near-identical real docs.
    boiler = [(i, "lorem ipsum dolor sit amet " * 10) for i in range(6)]
    real = [
        (100, "the quick brown fox jumps over the lazy dog near the river bank"),
        (101, "the quick brown fox jumps over the lazy dog near the river bend"),
    ]
    return spark.createDataFrame(boiler + real, "doc_id long, text string")


def test_cap_drops_megabucket_keeps_small(spark):
    docs = _docs(spark)
    uncapped = {
        (r.id_a, r.id_b) for r in dedup.minhash_lsh_candidates(docs).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_candidates(docs, max_bucket_size=4).collect()
    }
    # boilerplate pairs (6 docs -> 15 pairs) present uncapped, gone capped
    assert any(a < 100 and b < 100 for a, b in uncapped)
    assert not any(a < 100 and b < 100 for a, b in capped)
    # the small real bucket survives the cap
    assert (100, 101) in uncapped and (100, 101) in capped


def test_no_cap_is_default(spark):
    docs = _docs(spark)
    assert {(r.id_a, r.id_b) for r in dedup.minhash_dedup_pairs(docs, threshold=0.5).collect()} >= {
        (100, 101)
    }
