"""Physical-plan regression snapshots for the headline queries and the
post-window pipeline queries (39 pinned shapes as of r8; VERDICT r5
next-round #6, extended r7/r8): the round-5 quality came from plan
discipline — no unpartitioned windows, pre-agg below joins,
TakeOrderedAndProject for top-k, no cartesian products, no Python in
the hot path. This locks those properties so a Spark upgrade or a
refactor can't silently regress a plan while staying correct.

Snapshots are of the EXECUTED adaptive plan at the test SF (sf0.001,
8-core session): at this scale AQE resolves every equi-join to
broadcast-hash, which is itself part of the contract being locked (a
regression to sort-merge here means a broadcast threshold or a
pre-aggregation was lost). Larger-scale join-strategy behavior is
covered separately by SCALEPROBE.md's join-mix column — this test is
about shape, not scale.

The two BroadcastNestedLoopJoin allowances are single-row broadcasts
by construction: kpi_snapshot joins uncorrelated scalar-subquery
results (1 row), ann_cosine_topk joins the query vector (1 row).
"""

from __future__ import annotations

import pytest

from clickhouse_realtime_analytics_demo_spark.queries import all_queries

from tests.conftest import SF_DIR

# query -> (expected join-node counts, TakeOrderedAndProject expected)
SNAPSHOT: dict[str, tuple[dict[str, int], bool]] = {
    "daily_events": ({}, False),
    "hourly_event_matrix": ({}, False),
    "event_type_stats": ({}, False),
    "segment_revenue": ({"BroadcastHashJoinExec": 1}, False),
    "nation_revenue": ({"BroadcastHashJoinExec": 4}, False),
    "top_parts_per_brand": ({"BroadcastHashJoinExec": 1}, False),
    "top_customers": ({}, True),
    "session_stats": ({}, False),
    "cohort_retention": ({"BroadcastHashJoinExec": 1}, False),
    "user_rfm": ({"BroadcastHashJoinExec": 3}, False),
    "kpi_snapshot": ({"BroadcastNestedLoopJoinExec": 1}, False),
    "copurchased_parts": ({"BroadcastHashJoinExec": 1}, True),
    "dedup_exact": ({}, False),
    "dedup_minhash": ({"BroadcastHashJoinExec": 3}, False),
    "ann_cosine_topk": ({"BroadcastNestedLoopJoinExec": 1}, True),
    # round-7 additions (VERDICT r6 #4): the post-window pipeline
    # queries. dedup_cluster_resolution and the CC stage inside
    # corpus_prep_pipeline run their joins behind localCheckpoint
    # barriers (operators/graph.py), so the FINAL executed plan shows
    # only the post-checkpoint shape — the checkpoint rounds are
    # covered by the graph operator's own tests and scale probe.
    "dedup_cluster_resolution": ({}, False),
    "corpus_prep_pipeline": ({"BroadcastHashJoinExec": 1}, False),
    # r8: the scale-shaped composition. Its LSH candidate generation,
    # semi-pruned verify, and CC rounds all run behind eager
    # localCheckpoint barriers (operators/dedup.py
    # minhash_char_dedup_pairs — NOTHING corpus-sized is broadcast
    # there, asserted by tests/test_corpus_prep_lsh.py equality +
    # the operator's own plan); the final executed plan is the
    # keep-one anti-join (AQE-broadcast of the small non-rep side)
    # over the filtered scan plus the bounded per-lang agg.
    "corpus_prep_pipeline_lsh": ({"BroadcastHashJoinExec": 1}, False),
    "doc_repetition_stats": ({}, False),
    "contamination_check": ({"BroadcastHashJoinExec": 1}, False),
    # the round-7 live-route backings: per-customer pre-agg below two
    # broadcast joins + distributed top-k; single-pass events top-k
    "nation_activity": ({"BroadcastHashJoinExec": 2}, True),
    "top_active_users": ({}, True),
    # round-7 pipeline additions: PII scan is a pure aggregation; the
    # packing prefix sum keeps exactly ONE bounded-build nested-loop
    # join — the ≤num_buckets² triangular offsets join (r8: the
    # percentile bounds are collected to driver literals, ADVICE r7,
    # which removed the 3 former 1-row bounds crossJoin branches)
    "doc_pii_scan": ({}, False),
    # r8: the vocabulary join — rarity via an explicitly-broadcast
    # Zipf-bounded COMMON set (anti-hit), never a big-big token join
    "doc_rare_token_stats": ({"BroadcastHashJoinExec": 1}, False),
    # r8: split labels are a narrow when-chain over the hash draw —
    # no join anywhere, only the bounded (split, lang) summary agg
    "doc_split_assignment": ({}, False),
    # r8: chunking is a narrow explode over per-doc offset sequences —
    # no join, no UDF, only the bounded per-lang summary agg
    "doc_chunk_stats": ({}, False),
    # r8: BM25 — corpus stats collected to driver literals (bounded by
    # |query|), scoring is one narrow projection, ranked cut is a
    # distributed TakeOrderedAndProject; no join anywhere
    "doc_search_bm25": ({}, True),
    # r8: duplicated-span join shuffles on the uniform md5 key by
    # DESIGN (the duplicated set is not Zipf-bounded); at this SF AQE
    # correctly broadcasts the tiny hot side — that downgrade-to-
    # broadcast is the locked contract here, the operator itself
    # never forces one
    "doc_duplicate_spans": ({"BroadcastHashJoinExec": 1}, False),
    "doc_pack_shards": (
        {"BroadcastHashJoinExec": 1, "BroadcastNestedLoopJoinExec": 1},
        False,
    ),
    # r8: the shard-materialization twin rides the same packing plan
    # (bounded triangular offsets join) + the budget-bounded per-shard
    # collect — no new join shapes
    "doc_pack_concat": (
        {"BroadcastHashJoinExec": 1, "BroadcastNestedLoopJoinExec": 1},
        False,
    ),
    # r8 (continued): the as-of join is the union+partitioned-window
    # carry — NO join node at all (the WindowExec partition check
    # below is the load-bearing assertion)
    "events_asof_order": ({}, False),
    # exact quantiles: orders⋈customer (broadcast dim) + two windows
    # sharing one group-key exchange; never an unpartitioned window
    "order_value_quantiles": ({"BroadcastHashJoinExec": 1}, False),
    # centroids: pure explode+groupBy, map-side combined — no join
    "embedding_centroids": ({}, False),
    # bigram novelty: the bounded-vocab model is explicitly broadcast
    "doc_bigram_novelty": ({"BroadcastHashJoinExec": 1}, False),
    # windowFunnel: one range-frame window pass + ONE exact-timestamp
    # stage-stitch equi-join (AQE-broadcast at this SF) — never a
    # range-explosion join
    "window_funnel": ({"BroadcastHashJoinExec": 1}, False),
    # r8 wave 3: sequenceMatch is k chained mins over ONE user-keyed
    # window partition — no join, no range frame; the WindowExec
    # partition check below is the load-bearing assertion
    "sequence_match_levels": ({}, False),
    # retention(): two hash aggregates, constant-width tail — no join
    "purchase_retention": ({}, False),
    # argMin/argMax family: one sort-free hash aggregate — no join,
    # no window (the oracle uses the window form on purpose)
    "user_first_last_action": ({}, False),
    # r9: BPE training returns the driver-built merge table
    # (LocalTableScan — vocab-sized by construction); the per-
    # iteration pair-count/rewrite plan properties (partial agg, no
    # join, no corpus-sized broadcast, no Python nodes) are asserted
    # by tests/test_bpe.py::test_iteration_plan_shape
    "doc_bpe_train": ({}, False),
    # r10: the batched scale path returns the same driver-built merge
    # table (LocalTableScan); its per-round plan properties share
    # test_bpe.py's iteration contract (one pair-count aggregate per
    # ROUND instead of per merge)
    "doc_bpe_train_batched": ({}, False),
    # r10: the relaxed (production-merge-count) path — same driver-
    # built merge table (LocalTableScan); per-round plan contract is
    # identical to the batched path (the relaxation only changes the
    # driver-side pick rule, not any Spark plan)
    "doc_bpe_train_relaxed": ({}, False),
    # mixture rebalance: bounded source-dim weights broadcast onto
    # the doc scan (BHJ) + the 1-row totals crossJoin (BNLJ) — the
    # only document-sized pass is the scan
    "doc_mixture_rebalance": (
        {"BroadcastHashJoinExec": 1, "BroadcastNestedLoopJoinExec": 1},
        False,
    ),
    # r10: TF-IDF top-k — tf⋈df on token (the df side is vocabulary-
    # sized, AQE-broadcast at this SF) + the 1-row doc-count crossJoin;
    # the per-doc top-k window is partitioned (checked below) and
    # WindowGroupLimit-pruned
    "doc_tfidf_topk": (
        {"BroadcastHashJoinExec": 1, "BroadcastNestedLoopJoinExec": 1},
        False,
    ),
    # r10: int8 ANN — the float baseline's exact plan shape (1-row
    # query-vector broadcast + map-side integer scoring + distributed
    # top-k)
    "ann_cosine_topk_int8": ({"BroadcastNestedLoopJoinExec": 1}, True),
    # r11: the write-time-quantized store scan — identical plan shape
    # to the inline form, but the scan side reads the pre-quantized
    # tinyint column (no per-query quantization expressions)
    "ann_cosine_topk_int8_stored": ({"BroadcastNestedLoopJoinExec": 1}, True),
    # r11/r14: the IVF-partitioned store probe — the driver already
    # holds the query row (centroid selection), so the quantized query
    # vector is a LITERAL: one partition-pruned scan, no join at all
    # (pruning asserted from scan metrics in test_quantized_store.py).
    # r14 dropped the 1-row broadcast subquery that re-scanned the
    # whole store per query (VERDICT r13 #2)
    "ann_ivf_topk_stored": ({}, True),
    # r13/r14: IVF + float re-rank — the int8 probe is join-free (see
    # above); the float query-vector broadcast is the one BNLJ; the
    # bounded candidate set (top 200 ids) broadcasts into a
    # point-lookup BHJ on the float table; BOTH top-k cuts are
    # TakeOrdered (candidate cut + final), never a global sort
    "ann_ivf_topk_rerank": (
        {"BroadcastHashJoinExec": 1, "BroadcastNestedLoopJoinExec": 1},
        True,
    ),
    # r11: SemDeDup — the within-cluster pair join runs as two SMJ
    # arms (cell-keyed self-join + the CC edge attach), the keep-one
    # anti-join + union plumbing broadcast (3 BHJ), and the two
    # 1-row summary crossJoins are the BNLJs. Load-bearing negative:
    # no CartesianProductExec — pair work is cluster-confined
    "semantic_dedup": (
        {"BroadcastHashJoinExec": 3, "SortMergeJoinExec": 2, "BroadcastNestedLoopJoinExec": 2},
        False,
    ),
    # r10: budgeted selection — the ranking/prefix-sum composition's
    # bounded side aggregates broadcast back (8 BHJ) + packing's
    # ≤num_buckets² triangular offsets join (the one BNLJ, bounded
    # build). The load-bearing negative: ZERO unpartitioned windows —
    # the constant-kind fold hazard was hit and fixed at introduction
    # (queries/llmops.py::corpus_select_budget)
    "corpus_select_budget": (
        {"BroadcastHashJoinExec": 8, "BroadcastNestedLoopJoinExec": 1},
        False,
    ),
    # r11: topK state served query — four partial aggregations union
    # into the relational topKMerge (explode → sum → MG trim), where
    # the trim's cut rides a second window function over the SAME
    # partition spec as the rank: no join anywhere, every window
    # partitioned (the groups-sized cut join this shape replaced
    # would be a broadcast bomb at scale)
    "event_type_top_users_state": ({}, False),
    # r11: quantileExactState/Merge served query — histogram partials
    # union into the relational merge; the cumulative and total
    # windows share ONE group-keyed exchange; no join anywhere
    "order_status_quantiles_state": ({}, False),
    # r11: JSONExtract family — get_json_object is a codegen'd path
    # expression; pure scan + hash aggregate, no join, no Python
    "event_props_json": ({}, False),
    # r12: quantileTDigestState/Merge analog — the sketch BUILD is the
    # designed Arrow-batched combiner (mapInPandas emits O(compression)
    # centroids per partition-group, applyInPandas merges sketches);
    # extraction is relational (partitioned windows, no joins). The
    # Python nodes here are the operator, not a hot-path leak —
    # allowance scoped in _PANDAS_ALLOWED.
    "order_status_quantiles_tdigest": ({}, False),
}

_JOIN_NODES = (
    "BroadcastHashJoinExec",
    "SortMergeJoinExec",
    "ShuffledHashJoinExec",
    "BroadcastNestedLoopJoinExec",
    "CartesianProductExec",
)
_PYTHON_NODES = ("BatchEvalPythonExec", "ArrowEvalPythonExec", "MapInPandasExec")
# 1-row broadcasts; doc_pack_shards adds the ≤num_buckets² triangular
# offsets join (bounded build regardless of table size)
_BNLJ_ALLOWED = {
    "kpi_snapshot",
    "ann_cosine_topk",
    "doc_pack_shards",
    "doc_pack_concat",
    "doc_mixture_rebalance",
    "doc_tfidf_topk",
    "ann_cosine_topk_int8",
    "ann_cosine_topk_int8_stored",
    "ann_ivf_topk_rerank",
    "corpus_select_budget",
    "semantic_dedup",
}
# Queries whose OPERATOR is an Arrow-batched Pandas stage (sketch
# build/merge over bounded per-group state) — the Python node is the
# design, never a row-path leak; everything downstream stays JVM-side.
_PANDAS_ALLOWED = {"order_status_quantiles_tdigest"}


def _walk(node):
    yield node
    name = node.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        yield from _walk(node.executedPlan())
        return
    if name.endswith("QueryStageExec"):
        yield from _walk(node.plan())
        return
    for i in range(node.children().size()):
        yield from _walk(node.children().apply(i))


@pytest.mark.parametrize("name", sorted(SNAPSHOT))
def test_headline_plan_shape(spark, name):
    expected_joins, expect_top = SNAPSHOT[name]
    df = all_queries()[name].fn(spark, SF_DIR)
    df.collect()  # materialize so AQE's FINAL plan is snapshotted
    joins: dict[str, int] = {}
    take_ordered = 0
    for node in _walk(df._jdf.queryExecution().executedPlan()):
        cls = node.getClass().getSimpleName()
        if cls in _JOIN_NODES:
            joins[cls] = joins.get(cls, 0) + 1
        elif cls == "TakeOrderedAndProjectExec":
            take_ordered += 1
        elif cls == "WindowExec":
            # the one property with no legitimate exception: a window
            # without PARTITION BY serializes the whole input on one
            # task at any scale
            assert node.partitionSpec().size() > 0, (
                f"{name}: unpartitioned WindowExec in the executed plan"
            )
        else:
            assert cls not in _PYTHON_NODES or name in _PANDAS_ALLOWED, (
                f"{name}: Python eval node {cls} in a headline plan"
            )

    assert joins.get("CartesianProductExec", 0) == 0, f"{name}: cartesian product"
    if name not in _BNLJ_ALLOWED:
        assert joins.get("BroadcastNestedLoopJoinExec", 0) == 0, (
            f"{name}: unexpected nested-loop join {joins}"
        )
    assert joins == expected_joins, (
        f"{name}: join shape drifted: expected {expected_joins}, executed {joins}"
    )
    assert (take_ordered > 0) == expect_top, (
        f"{name}: TakeOrderedAndProject expected={expect_top}, found {take_ordered}"
    )
