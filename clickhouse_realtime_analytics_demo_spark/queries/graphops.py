"""Post-window query registrations: cluster resolution (near-dup
pair graph → connected components → keep-one, operators/graph.py),
the end-to-end corpus-prep pipeline, Gopher-style repetition
filters, and eval-set contamination checking.

Registered AFTER every other query module (see ``registry.
all_queries``): the driver's correctness record holds exactly the
first 50 registered queries, and those 50 slots are locked — the
oracle entry here takes slot 51+, gated by the same local DuckDB
comparison in tests/test_correctness.py instead (the recursive-CTE
transitive closure below IS a full independent implementation of
connected components, so the local gate is as strong as a driver
slot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.catalog import table
from clickhouse_realtime_analytics_demo_spark.operators import dedup, graph, sampling, text
from clickhouse_realtime_analytics_demo_spark.queries.registry import register

# DuckDB mirror of operators.text.quality_score (same closed form the
# doc_quality oracle uses)
_QUALITY_SQL = (
    "0.5*LEAST(CAST(length(string_split_regex(trim(text),'\\s+')) AS DOUBLE)/50.0,1.0)"
    " + 0.5*(CAST(length(regexp_replace(text,'[^A-Za-z0-9]','','g')) AS DOUBLE)"
    "/GREATEST(CAST(n_chars AS DOUBLE),1.0))"
)


@register(
    "dedup_cluster_resolution",
    # Independent oracle: pair generation identical to the
    # ngram_jaccard_sample oracle; components via recursive-CTE
    # transitive closure (min reachable id), a completely different
    # algorithm from the star contraction under test.
    oracle="""
    WITH RECURSIVE grams AS (
        SELECT doc_id, source,
               list_distinct(list_transform(
                   generate_series(1, GREATEST(length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) - 2, 1)),
                   i -> substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), CAST(i AS INTEGER), 3)
               )) AS sh
        FROM documents WHERE doc_id < 120
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM grams a JOIN grams b ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE CAST(length(list_intersect(a.sh, b.sh)) AS DOUBLE)
                / CAST(length(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.3
    ),
    sym AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    reach(a, b) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    )
    SELECT a AS id, LEAST(a, MIN(b)) AS component
    FROM reach GROUP BY a ORDER BY id
    """,
)
def dedup_cluster_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (exact char-3-gram Jaccard ≥ 0.3, source-blocked)
    resolved into clusters by Large-Star/Small-Star contraction —
    ``component`` is the min doc_id of each cluster, the id the
    keep-one policy retains.
    """
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.3, n=3, block_col="source")
    return graph.connected_components(pairs).orderBy("id")


@register(
    "corpus_prep_pipeline",
    # The whole prep flow mirrored independently in DuckDB: quality
    # filter → exact-Jaccard pairs blocked by (source, lang) →
    # recursive-CTE components → keep-one → md5-hash sample → per-lang
    # summary. Every stage is portable (closed-form quality, string
    # n-grams, md5 membership), so the END-TO-END composition is
    # value-checked, not just each operator alone.
    oracle=f"""
    WITH RECURSIVE filtered AS (
        SELECT doc_id, lang, source, text, n_chars FROM documents
        WHERE {_QUALITY_SQL} >= 0.55
    ),
    grams AS (
        SELECT doc_id, source, lang,
               list_distinct(list_transform(
                   generate_series(1, GREATEST(length(trim(regexp_replace(lower(text),'\\s+',' ','g'))) - 2, 1)),
                   i -> substr(trim(regexp_replace(lower(text),'\\s+',' ','g')), CAST(i AS INTEGER), 3))) AS sh
        FROM filtered
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM grams a JOIN grams b
          ON a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE CAST(length(list_intersect(a.sh, b.sh)) AS DOUBLE)
                / CAST(length(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.6
    ),
    sym AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    reach(a, b) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ),
    comp AS (SELECT a AS id, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a),
    survivors AS (
        SELECT f.* FROM filtered f LEFT JOIN comp c ON f.doc_id = c.id
        WHERE c.id IS NULL OR c.component = f.doc_id
    ),
    sampled AS (
        SELECT * FROM survivors
        WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':cp'), 1, 15)
                < '{sampling.fraction_threshold(0.8)}'
    )
    SELECT lang,
           COUNT(*) AS docs,
           CAST(SUM(length(regexp_extract_all(text, '{text.BPE_PATTERN}'))) AS BIGINT)
             AS total_bpe_tokens,
           MIN({_QUALITY_SQL}) AS min_quality
    FROM sampled GROUP BY lang ORDER BY lang
    """,
)
def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data prep flow, end to end: quality
    filter (C4/Gopher-style closed form ≥ 0.55) → near-dup clusters
    (exact char-3-gram Jaccard ≥ 0.6, blocked by source+lang, resolved
    by star contraction) → keep-one-per-cluster → deterministic 80%
    hash sample → per-lang corpus stats.

    Scale: the quality filter and the sample are narrow (no shuffle);
    blocking bounds the verify join (at 100 TB the block is an LSH
    bucket instead — ``minhash_dedup_pairs`` feeds the same
    ``keep_one_per_cluster``); the summary is one final groupBy on a
    bounded key. min_quality (not avg): MIN over doubles is
    order-independent, so the oracle comparison stays bit-exact
    without the decimal-sum detour.
    """
    filtered, blocked = _prep_filtered(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(blocked, threshold=0.6, n=3, block_col="blk")
    return _prep_downstream(filtered, pairs)


def _prep_filtered(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Shared quality-filter stage of the two corpus-prep pipelines:
    (filtered docs, filtered docs + the (source,lang) block key)."""
    docs = table(spark, sf_dir, "documents")
    quality = text.quality_score(F.col("text"), F.col("n_chars"))
    filtered = docs.filter(quality >= 0.55).select(
        "doc_id", "lang", "source", "text", "n_chars"
    )
    return filtered, filtered.withColumn("blk", F.concat_ws("|", "source", "lang"))


def _prep_downstream(filtered: DataFrame, pairs: DataFrame) -> DataFrame:
    """Shared tail of the two corpus-prep pipelines: keep-one → 80%
    hash sample → per-lang stats."""
    kept = graph.keep_one_per_cluster(filtered, pairs)
    sampled = sampling.sample_hash(kept, "doc_id", 0.8, seed="cp")
    return (
        sampled.groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum(text.bpe_token_count(F.col("text"))).alias("total_bpe_tokens"),
            F.min(text.quality_score(F.col("text"), F.col("n_chars"))).alias(
                "min_quality"
            ),
        )
        .orderBy("lang")
    )


@register("corpus_prep_pipeline_lsh")  # rows-only: xxhash64 MinHash has
# no DuckDB twin. Pinned instead by tests/test_corpus_prep_lsh.py:
# (a) END-TO-END output equality vs the oracle-green exact
# corpus_prep_pipeline at sf0.001 and sf0.01 (where LSH recall at the
# 0.6 threshold is total), (b) survivor-SET equality, (c) a pair-set
# recall assertion vs dedup.ngram_jaccard_pairs.
def corpus_prep_pipeline_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-prep composition in its 100 TB shape (VERDICT r7 #1):
    quality filter → MinHash-LSH candidates over char-3-gram sets with
    the ``max_bucket_size`` valve → exact-Jaccard verify on semi-pruned
    shingles (``dedup.minhash_char_dedup_pairs``) → star-contraction
    keep-one → deterministic 80% hash sample → per-lang stats.

    Same similarity measure, threshold, blocking, and downstream as
    ``corpus_prep_pipeline`` — but candidate generation is bucketed
    (work ∝ colliding docs, never block²) and nothing corpus-sized is
    ever broadcast. The exact form stays registered as the DuckDB-
    checkable twin; this is the one to run on a real corpus, and the
    one benchmarked.

    Plan-reuse decision, by measurement (VERDICT r7 #5): ``filtered``
    is consumed by pair generation, the keep-one anti-join, and the
    final agg. Interleaved best-of-3 at sf0.1: re-scan 8.36/7.32 s vs
    ``filtered.persist()`` 8.71/8.01 s (an earlier non-interleaved
    session showed the opposite ordering) — the difference is inside
    this box's same-plan variance because the documents scan is one
    small file and the quality expression is narrow, so the simpler
    re-scan form ships. At 100 TB the same three consumers re-read a
    corpus-sized scan; there, materialize ``filtered`` once (persist
    to disk or an intermediate table) — the shingle checkpoint inside
    ``minhash_char_dedup_pairs`` already does this for the expensive
    derived arrays, which is why re-scan stays cheap here.
    """
    filtered, blocked = _prep_filtered(spark, sf_dir)
    pairs = dedup.minhash_char_dedup_pairs(
        blocked, threshold=0.6, bands=16, shingle_n=3,
        max_bucket_size=64, block_col="blk",
    )
    return _prep_downstream(filtered, pairs)


@register(
    "doc_repetition_stats",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
        FROM documents WHERE doc_id < 200
    ),
    bi AS (
        SELECT doc_id, t,
               CASE WHEN len(t) >= 2
                    THEN list_transform(generate_series(1, len(t) - 1),
                                        i -> t[i] || ' ' || t[i + 1])
                    ELSE [] END AS bgs
        FROM toks
    ),
    cnt AS (
        SELECT doc_id, bg, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(bgs) AS bg FROM bi)
        GROUP BY doc_id, bg
    ),
    top AS (SELECT doc_id, MAX(c) AS mx FROM cnt GROUP BY doc_id)
    SELECT b.doc_id AS id,
           CAST(len(b.t) AS BIGINT) AS n_toks,
           CAST(len(list_distinct(b.t)) AS DOUBLE) / CAST(len(b.t) AS DOUBLE)
             AS distinct_token_ratio,
           CASE WHEN len(b.t) >= 2
                THEN CAST(top.mx AS DOUBLE) / CAST(len(b.t) - 1 AS DOUBLE)
                ELSE 0.0 END AS top_bigram_frac
    FROM bi b JOIN top ON b.doc_id = top.doc_id
    ORDER BY id
    """,
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1):
    distinct-token ratio and most-frequent-bigram fraction per doc —
    the repetition side of pretraining quality filtering, next to
    ``doc_quality``'s length/char-ratio side."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return text.repetition_stats(docs).orderBy("id")


@register(
    "contamination_check",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
            generate_series(1, GREATEST(len(t) - 2, 1)),
            i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))) AS g
        FROM toks
    )
    SELECT c.doc_id AS corpus_id, p.doc_id AS probe_id, COUNT(*) AS shared_ngrams
    FROM grams c JOIN grams p ON c.g = p.g
    WHERE c.doc_id >= 20 AND p.doc_id < 20
    GROUP BY corpus_id, probe_id
    HAVING COUNT(*) >= 2
    ORDER BY corpus_id, probe_id
    """,
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination sweep: docs 0-19 stand in for an eval
    set; every other doc sharing ≥ 2 distinct word trigrams with one
    of them is flagged with the overlap count (GPT-3 §C / PaLM §9
    decontamination shape — trigram scale chosen because this
    synthetic corpus' grams are near-unique at n=3)."""
    docs = table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") >= 20)
    probes = docs.filter(F.col("doc_id") < 20)
    return text.ngram_contamination(corpus, probes, n=3, min_shared=2).orderBy(
        "corpus_id", "probe_id"
    )


@register("dedup_minhash_keep_one")  # rows-only: xxhash64 MinHash pairs
def dedup_minhash_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-dedup pipeline end to end: MinHash-LSH pairs →
    components → drop non-representatives. One summary row
    (total/survivors/dropped) — the number a pipeline operator reads
    to see the dedup savings."""
    docs = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(docs, threshold=0.7)
    kept = graph.keep_one_per_cluster(docs, pairs)
    total = docs.count()
    survivors = kept.count()
    return spark.createDataFrame(
        [(total, survivors, total - survivors)],
        "total_docs long, survivors long, dropped long",
    )
