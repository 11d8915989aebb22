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


def _blocked_docs(spark):
    # block "mega": 6 near-identical docs (quadratic blow-up bait);
    # block "ok": 2 near-identical docs.
    mega = [(i, "mega", "alpha beta gamma delta epsilon zeta " * 8 + f"tail{i}") for i in range(6)]
    ok = [
        (100, "ok", "the quick brown fox jumps over the lazy dog near the river bank"),
        (101, "ok", "the quick brown fox jumps over the lazy dog near the river bend"),
    ]
    return spark.createDataFrame(mega + ok, "doc_id long, blk string, text string")


def test_block_cap_drops_megablock_keeps_small(spark):
    docs = _blocked_docs(spark)
    uncapped = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5, block_col="blk").collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.5, block_col="blk", max_block_size=4
        ).collect()
    }
    assert any(a < 100 and b < 100 for a, b in uncapped)
    assert not any(a < 100 and b < 100 for a, b in capped)  # mega block dropped
    assert (100, 101) in uncapped and (100, 101) in capped  # small block kept


def test_unblocked_cap_refuses_oversized_input(spark):
    docs = _blocked_docs(spark)
    # whole input is one block of 8 > cap 4: the all-pairs form refuses
    assert dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_block_size=4).count() == 0
    # cap >= input size: behaves exactly like no cap
    assert {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_block_size=8).collect()
    } == {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }


def test_lazy_checkpoint_knob(spark):
    # eager=False (ADVICE r8): plan CONSTRUCTION must not run Spark
    # jobs; results must match the eager form bit-for-bit.
    docs = spark.createDataFrame(
        [(i, f"the quick brown fox {i % 3} jumps over the lazy dog") for i in range(12)],
        "doc_id bigint, text string",
    )
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    lazy = dedup.minhash_char_dedup_pairs(docs, threshold=0.5, eager=False)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "constructing the lazy plan ran Spark jobs"
    eager = dedup.minhash_char_dedup_pairs(docs, threshold=0.5)
    assert sorted(map(tuple, lazy.collect())) == sorted(map(tuple, eager.collect()))
