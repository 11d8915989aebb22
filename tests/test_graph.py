"""Connected components / cluster resolution (operators/graph.py).

Correctness gate: Spark star-contraction output must equal a
driver-side union-find on the same edge list — on adversarial
topologies (long chains = worst case for label propagation, cliques =
the near-dup shape, stars, isolated pairs) and on seeded random
graphs.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.operators.graph import (
    connected_components,
    keep_one_per_cluster,
)


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    return {n: min(m for m in nodes if find(m) == find(n)) for n in nodes}


def _spark_cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    return {
        r["id"]: r["component"] for r in connected_components(df, **kw).collect()
    }


def _assert_matches(spark, edges):
    nodes = sorted({n for e in edges for n in e})
    expected = _union_find(nodes, edges)
    # default path (these graphs are small → r15 driver resolution)
    assert _spark_cc(spark, edges) == expected
    # distributed star-contraction path, forced past the driver valve
    # (driver_max_edges=0) — must produce the identical assignment
    assert _spark_cc(spark, edges, driver_max_edges=0) == expected


def test_chain_worst_case(spark):
    # A 64-node path: diameter 63 — label propagation would need 63
    # rounds; star contraction must still converge inside the cap.
    _assert_matches(spark, [(i, i + 1) for i in range(63)])


def test_two_cliques_and_isolated_pair(spark):
    clique1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    clique2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    _assert_matches(spark, clique1 + clique2 + [(100, 101)])


def test_star_and_reversed_edges(spark):
    # Hub-and-spoke with edges given in both orientations + duplicates.
    edges = [(50, i) for i in range(5)] + [(i, 50) for i in range(5)]
    _assert_matches(spark, edges)


def test_random_graphs_match_union_find(spark):
    rng = random.Random(20260814)
    for _ in range(3):
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(90)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        _assert_matches(spark, edges)


def test_string_ids(spark):
    edges = [("doc-b", "doc-a"), ("doc-b", "doc-c"), ("zz", "yy")]
    got = _spark_cc(spark, edges)
    assert got == {
        "doc-a": "doc-a",
        "doc-b": "doc-a",
        "doc-c": "doc-a",
        "yy": "yy",
        "zz": "yy",
    }


def test_null_and_self_edges_dropped(spark):
    df = spark.createDataFrame(
        [(1, 2), (None, 3), (4, None), (5, 5)],
        "id_a int, id_b int",
    )
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    # NULL-endpoint and self edges contribute nothing; 3/4/5 have no
    # (valid) edges so they are absent by contract.
    assert got == {1: 1, 2: 1}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).collect() == []


def test_driver_valve_threshold_boundary(spark):
    """r15 driver-resolution valve: at the boundary the two paths pick
    correctly and agree bit-for-bit; stats reports which path ran."""
    edges = [(i, i + 1) for i in range(10)]
    stats_drv: dict = {}
    got_drv = _spark_cc(spark, edges, stats=stats_drv, driver_max_edges=10)
    assert stats_drv == {"rounds": 0, "driver_edges": 10}
    stats_dist: dict = {}
    # one fewer than the edge count → probe overflows → distributed
    got_dist = _spark_cc(spark, edges, stats=stats_dist, driver_max_edges=9)
    assert stats_dist["rounds"] >= 1 and "driver_edges" not in stats_dist
    assert got_drv == got_dist == {i: 0 for i in range(11)}


def test_driver_valve_string_ids_match_distributed(spark):
    # UTF8_BINARY vs Python str ordering must agree on the min-id pick
    edges = [("b", "a"), ("b", "c"), ("Z", "z"), ("é", "e")]
    assert _spark_cc(spark, edges) == _spark_cc(spark, edges, driver_max_edges=0)


def test_keep_one_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], ["doc_id", "text"]
    )
    # Clusters {0,1,2} (a chain) and {7,8}; 3,4,5,6,9 untouched.
    pairs = spark.createDataFrame([(0, 1), (1, 2), (7, 8)], ["id_a", "id_b"])
    kept = keep_one_per_cluster(docs, pairs)
    assert [c.name for c in kept.schema] == ["doc_id", "text"]
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [0, 3, 4, 5, 6, 7, 9]


def test_representative_is_component_min_not_layout_dependent(spark):
    # Same edge set, shuffled input order and higher parallelism —
    # assignments must be identical (deterministic min-id contract).
    edges = [(i, i + 1) for i in range(20)] + [(30, 40), (40, 31)]
    base = _spark_cc(spark, edges)
    shuffled = list(reversed(edges))
    df = spark.createDataFrame(shuffled, ["id_a", "id_b"]).repartition(16)
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == base
    assert all(comp <= node for node, comp in got.items())


# ------------------------------------------------- property-based (CC)

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(deadline=None, max_examples=10, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=0,
        max_size=60,
    )
)
def test_cc_matches_union_find_on_random_graphs(spark, edge_list):
    edges = [e for e in edge_list if e[0] != e[1]]
    if not edges:
        df = spark.createDataFrame([], "id_a long, id_b long")
        from clickhouse_realtime_analytics_demo_spark.operators.graph import (
            connected_components,
        )

        assert connected_components(df).collect() == []
        return
    _assert_matches(spark, edges)


def test_keep_one_composes_with_embedding_pairs(spark):
    """Semantic dedup end to end: embedding near-dup pairs (the
    registered LSH-bucketed cosine query, which plants true near-dups
    into the random fixture vectors) feed the same
    keep_one_per_cluster as text dedup. For every reported pair, at
    most one endpoint may survive; unpaired vectors all survive."""
    from clickhouse_realtime_analytics_demo_spark.queries import all_queries
    from tests.conftest import SF_DIR

    pairs = all_queries()["embedding_near_dups"].fn(spark, SF_DIR).select("id_a", "id_b")
    pair_rows = pairs.collect()
    assert pair_rows, "planted near-dup pairs expected"
    paired = {p["id_a"] for p in pair_rows} | {p["id_b"] for p in pair_rows}
    # corpus ids = every paired id + some unpaired filler
    ids = sorted(paired) + [77_000_000, 77_000_001]
    docs = spark.createDataFrame([(i,) for i in ids], ["vec_id"])
    kept = keep_one_per_cluster(docs, pairs, id_col="vec_id")
    kept_ids = {r["vec_id"] for r in kept.collect()}
    for p in pair_rows:
        assert not (p["id_a"] in kept_ids and p["id_b"] in kept_ids), p
    assert {77_000_000, 77_000_001} <= kept_ids
