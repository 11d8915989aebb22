"""Arrow/numpy centroid assignment (r11): the plan-literal form folds
|C|×dim floats into the Catalyst plan — fine at 16 cells, hostile at
the 10⁴-10⁵ cells a production coarse quantizer carries. The Arrow
path must agree with the literal path bit-for-bit on real data (both
are argmax over the same cosines; a flip needs a tie within float
error, which random 64-dim data never produces) and engage
automatically past the literal-size threshold.
"""

from __future__ import annotations

from clickhouse_realtime_analytics_demo_spark.operators import similarity
from tests.conftest import SF_DIR


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_arrow_assignment_matches_literal(spark):
    emb = _emb(spark)
    seeds = emb.orderBy("vec_id").limit(8).select("embedding").collect()
    cents = [[float(x) for x in r[0]] for r in seeds]
    lit = {
        r.id: r.cell
        for r in similarity._assign_cells(emb, cents, "vec_id", "embedding").collect()
    }
    arrow = {
        r.id: r.cell
        for r in similarity.assign_cells_arrow(emb, cents, "vec_id", "embedding").collect()
    }
    assert lit == arrow


def test_auto_switch_past_literal_threshold(spark):
    emb = _emb(spark)
    # 128 cells x 64 dims = 8192 floats > the 4096 literal cap -> the
    # arrow path engages inside ivf_index transparently; the result
    # must still be a total assignment with in-range cells and the
    # usual (id, vec, cell) shape the downstream operators consume
    assigned, cents = similarity.ivf_index(emb, num_cells=128, lloyd_iters=1)
    assert len(cents) == 128
    rows = assigned.collect()
    assert len(rows) == emb.count()
    assert all(0 <= r.cell < 128 for r in rows)
    # no Python in the plan when the literal path is active; the arrow
    # path is the ONE sanctioned mapInPandas here
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_semantic_pairs_at_high_cell_count(spark):
    # the SemDeDup pipeline still finds the planted dups when the
    # quantizer runs through the arrow assignment (96 cells x 64 dims
    # clears the threshold); a 5e-4 copy co-clusters with its original
    # at any cell count
    from clickhouse_realtime_analytics_demo_spark.queries.llmops import _planted_corpus

    corpus = _planted_corpus(spark, SF_DIR)
    pairs = {
        (r.id_a, r.id_b)
        for r in similarity.semantic_dedup_pairs(
            corpus, threshold=0.95, num_cells=96
        ).collect()
    }
    assert pairs == {(i, i + 1_000_000) for i in range(5)}
