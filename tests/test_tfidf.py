"""TF-IDF top-k per document (r10): pinned against an independent
pure-Python reference of the same rule (tokenize→tf→df→round(tf·ln(N/
df),6)→rank by (score desc, token asc)), plus the edge cases the SQL
oracle can't isolate (empty/whitespace docs excluded, ties broken by
token, k cutoff) and the WindowGroupLimit scale contract. The DuckDB
equality at sf0.001/sf0.01 is covered by tests/test_correctness.py via
the registered oracle.
"""

from __future__ import annotations

import math

from clickhouse_realtime_analytics_demo_spark.operators.text import tfidf_topk


def _reference(rows: list[tuple[int, str]], k: int = 3):
    """Plain-Python twin: dict arithmetic only, no Spark."""
    tf: dict[tuple[int, str], int] = {}
    docs = set()
    for doc_id, text in rows:
        toks = [t for t in text.strip().lower().split() if t]
        if not toks:
            continue
        docs.add(doc_id)
        for t in toks:
            tf[(doc_id, t)] = tf.get((doc_id, t), 0) + 1
    df: dict[str, int] = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    n = len(docs)
    out = []
    for d in sorted(docs):
        scored = [
            (round(c * math.log(n / df[t]), 6), t, c)
            for (doc, t), c in tf.items()
            if doc == d
        ]
        scored.sort(key=lambda x: (-x[0], x[1]))
        for rank, (score, tok, c) in enumerate(scored[:k], start=1):
            out.append((d, tok, c, df[tok], score, rank))
    return out


FIXTURE = [
    (1, "apple banana apple cherry"),
    (2, "banana banana durian"),
    (3, "cherry durian elderberry elderberry elderberry"),
    (4, "   "),  # whitespace-only: excluded from N and output
    (5, "apple"),
]


def _run(spark, rows, k=3):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = tfidf_topk(df, k=k).orderBy("doc_id", "tok_rank").collect()
    return [tuple(r) for r in got]


def test_matches_python_reference(spark):
    assert _run(spark, FIXTURE) == _reference(FIXTURE)


def test_whitespace_and_null_docs_excluded(spark):
    rows = [(1, "alpha beta"), (2, None), (3, "\n\t "), (4, "beta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = tfidf_topk(df).select("doc_id").distinct().collect()
    assert sorted(r[0] for r in got) == [1, 4]
    # N counts only the two surviving docs: 'beta' in both -> ln(2/2)=0
    scores = {
        (r["doc_id"], r["token"]): r["score"]
        for r in tfidf_topk(df).collect()
    }
    assert scores[(1, "beta")] == 0.0
    assert scores[(4, "beta")] == 0.0
    assert scores[(1, "alpha")] == round(math.log(2.0), 6)


def test_tie_break_is_token_asc(spark):
    # two tokens with identical tf and df in one doc: rank by token
    rows = [(1, "zeta alpha"), (2, "other words")]
    got = _run(spark, rows, k=2)
    d1 = [r for r in got if r[0] == 1]
    assert [r[1] for r in d1] == ["alpha", "zeta"]
    assert [r[5] for r in d1] == [1, 2]


def test_k_cutoff(spark):
    rows = [(1, "a b c d e f"), (2, "g")]
    got = _run(spark, rows, k=3)
    assert sum(1 for r in got if r[0] == 1) == 3


def test_window_group_limit_in_plan(spark):
    """The top-k window must be WindowGroupLimit-pruned (map-side
    filter before the per-doc shuffle) — the property that keeps the
    per-doc rank from materializing every (doc, token) score row
    through the window exchange at corpus scale."""
    df = spark.createDataFrame(FIXTURE, "doc_id long, text string")
    out = tfidf_topk(df)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
