"""IVF ANN: assignment totality, Lloyd convergence sanity, probe
pruning, and recall against the exact brute-force baseline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from clickhouse_realtime_analytics_demo_spark.catalog import table
from clickhouse_realtime_analytics_demo_spark.operators import similarity


@pytest.fixture(scope="module")
def emb(spark):
    return table(spark, SF_DIR, "embeddings")


def test_every_vector_assigned_exactly_one_cell(spark, emb):
    assigned, cents = similarity.ivf_index(emb, num_cells=8, lloyd_iters=1)
    n = emb.count()
    assert assigned.count() == n
    cells = assigned.agg(F.min("cell"), F.max("cell")).collect()[0]
    assert 0 <= cells[0] and cells[1] <= 7
    assert len(cents) == 8 and all(len(c) == 64 for c in cents)


def test_assignment_deterministic(spark, emb):
    a1 = similarity.ivf_index(emb, num_cells=8, lloyd_iters=1)[0]
    a2 = similarity.ivf_index(emb, num_cells=8, lloyd_iters=1)[0]
    assert sorted((r.id, r.cell) for r in a1.collect()) == sorted(
        (r.id, r.cell) for r in a2.collect()
    )


def test_probe_scans_subset(spark, emb):
    assigned, cents = similarity.ivf_index(emb, num_cells=16, lloyd_iters=1)
    sizes = {r.cell: r.cnt for r in assigned.groupBy("cell").agg(F.count("*").alias("cnt")).collect()}
    total = sum(sizes.values())
    # probing 4 of 16 cells must touch a strict subset of the corpus
    assert sum(sorted(sizes.values(), reverse=True)[:4]) < total


def test_recall_vs_exact(spark, emb):
    exact = [r.neighbor_id for r in similarity.brute_force_topk(emb, query_id=0, k=10).collect()]
    approx = [
        r.neighbor_id
        for r in similarity.ivf_topk(emb, query_id=0, k=10, num_cells=16, nprobe=4).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, f"IVF recall {recall} too low (exact={exact}, ivf={approx})"


# ---------------------------- int8 quantized scoring (r10)


def test_quantized_values_and_range(spark):
    df = spark.createDataFrame(
        [(0, [1.0, -0.5, 0.25, 0.0]), (1, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r.qvec for r in similarity.with_quantized(df).collect()}
    # scale = 1.0/127 -> q = round(x * 127)
    assert rows[0] == [127, -64, 32, 0]  # round(-63.5) away from zero = -64
    # zero vector: scale floor keeps q all-zero, no div-by-zero
    assert rows[1] == [0, 0, 0, 0]


def test_int_cosine_zero_vector_is_zero(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [([1, 2], [0, 0]), ([1, 0], [1, 0])], "a array<int>, b array<int>"
    )
    got = [r[0] for r in df.select(similarity.int_cosine(F.col("a"), F.col("b"))).collect()]
    assert got[0] == 0.0 and abs(got[1] - 1.0) < 1e-12


def test_quantized_recall_vs_exact(spark, emb):
    exact = [r.neighbor_id for r in similarity.brute_force_topk(emb, query_id=0, k=10).collect()]
    quant = [r.neighbor_id for r in similarity.quantized_topk(emb, query_id=0, k=10).collect()]
    recall = len(set(exact) & set(quant)) / 10
    # int8 keeps ~2 decimal digits of each component; on the real
    # embeddings table recall@10 measured 1.0 at sf0.001 AND sf0.01 —
    # gate at 0.8 to absorb future testdata regeneration
    assert recall >= 0.8, f"int8 recall {recall} (exact={exact}, quant={quant})"
