"""repetition_stats edge cases + hand-computed values."""

from __future__ import annotations

from clickhouse_realtime_analytics_demo_spark.operators.text import repetition_stats


def _rows(spark, docs):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return {
        r["id"]: (r["n_toks"], r["distinct_token_ratio"], r["top_bigram_frac"])
        for r in repetition_stats(df).collect()
    }


def test_hand_computed_values(spark):
    got = _rows(
        spark,
        [
            (1, "a b a b a"),      # 5 toks, 2 distinct; bigrams: ab,ba,ab,ba → top 2/4
            (2, "x y z"),           # all distinct; bigrams xy,yz → top 1/2
            (3, "w w w w"),         # 4 toks 1 distinct; bigrams ww×3 → 3/3
        ],
    )
    assert got[1] == (5, 2 / 5, 2 / 4)
    assert got[2] == (3, 1.0, 1 / 2)
    assert got[3] == (4, 1 / 4, 1.0)


def test_degenerate_docs(spark):
    # single token → no bigrams → top fraction 0 by contract;
    # whitespace-mess normalizes first
    got = _rows(spark, [(1, "solo"), (2, "  Tab\t\tand   space  ")])
    assert got[1] == (1, 1.0, 0.0)
    assert got[2] == (3, 1.0, 0.5)  # "tab and space"
