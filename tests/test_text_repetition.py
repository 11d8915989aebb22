"""repetition_stats edge cases + hand-computed values."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_contamination_and_decontaminate(spark):
    """decontaminate drops exactly the flagged corpus docs; planted
    overlap is found, disjoint docs are not."""
    from clickhouse_realtime_analytics_demo_spark.operators.text import (
        decontaminate,
        ngram_contamination,
    )

    eval_q = "what is the capital city of france and when was it founded exactly"
    corpus = spark.createDataFrame(
        [
            (1, "some answer mentions the capital city of france and when it rains"),
            (2, "completely unrelated text about distributed sorting networks today"),
            (3, eval_q),  # verbatim leak
        ],
        ["doc_id", "text"],
    )
    probes = spark.createDataFrame([(100, eval_q)], ["doc_id", "text"])
    hits = {
        (r["corpus_id"], r["probe_id"]): r["shared_ngrams"]
        for r in ngram_contamination(corpus, probes, n=3, min_shared=2).collect()
    }
    assert (3, 100) in hits and hits[(3, 100)] >= 10  # verbatim: all grams
    assert (1, 100) in hits  # partial phrase overlap
    assert all(c != 2 for c, _ in hits)
    kept = sorted(r["doc_id"] for r in decontaminate(corpus, probes).collect())
    assert kept == [2]


def test_pii_redaction_unit(spark):
    from clickhouse_realtime_analytics_demo_spark.operators import text as T

    rows = [
        (1, "mail me at a.b-c%d@sub.example.co or 555-123-4567 from 192.168.0.1 ok"),
        (2, "clean text with no contacts at all"),
        (3, "two mails x@y.io z@w.ai and ip 10.0.0.255"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            T.redact_pii(F.col("t")).alias("red"),
            T.pii_count(F.col("t"), "email").alias("e"),
            T.pii_count(F.col("t"), "phone").alias("p"),
            T.pii_count(F.col("t"), "ipv4").alias("i"),
        ).collect()
    }
    assert out[1]["red"] == "mail me at <EMAIL> or <PHONE> from <IP> ok"
    assert (out[1]["e"], out[1]["p"], out[1]["i"]) == (1, 1, 1)
    assert out[2]["red"] == rows[1][1] and out[2]["e"] == 0
    assert out[3]["red"] == "two mails <EMAIL> <EMAIL> and ip <IP>"


def test_chunk_documents_window_algebra(spark):
    from clickhouse_realtime_analytics_demo_spark.operators import text as t

    rows = [
        (1, "a" * 300),          # shorter than chunk_size: 1 chunk
        (2, "b" * 500),          # exactly chunk_size: 1 chunk
        (3, "c" * 501),          # one char over: 2 chunks
        (4, "d" * 900),          # 500 + 400: 2 chunks, no dangling tail
        (5, "e" * 901),          # 3 chunks, last is 101 chars
        (6, None),               # null: no chunks
        (7, ""),                 # empty: no chunks
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.id, r.chunk_idx): (r.chunk_start, len(r.chunk_text))
        for r in t.chunk_documents(docs, chunk_size=500, stride=400).collect()
    }
    assert out == {
        (1, 0): (1, 300),
        (2, 0): (1, 500),
        (3, 0): (1, 500), (3, 1): (401, 101),
        (4, 0): (1, 500), (4, 1): (401, 500),
        (5, 0): (1, 500), (5, 1): (401, 500), (5, 2): (801, 101),
    }
    # every character covered: union of [start, start+len) spans 1..n
    for doc_id, n in ((3, 501), (5, 901)):
        covered = set()
        for (d, _), (s, ln) in out.items():
            if d == doc_id:
                covered.update(range(s, s + ln))
        assert covered == set(range(1, n + 1))
    import pytest

    with pytest.raises(ValueError):
        t.chunk_documents(docs, chunk_size=500, stride=501)


def test_bm25_empty_corpus(spark):
    # ADVICE r8: an empty filtered corpus used to crash float(None) on
    # the NULL avgdl; it must return an empty frame with the schema.
    from clickhouse_realtime_analytics_demo_spark.operators.text import bm25_scores

    docs = spark.createDataFrame([], "doc_id bigint, text string")
    out = bm25_scores(docs, ("merge", "vector"))
    assert out.columns == ["id", "score"]
    assert out.count() == 0
