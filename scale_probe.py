"""Scale probe: measure how headline operators scale with data size.

Replicates the driver's sf0.1 tables K times (ids shifted per copy so
keys stay unique; users/docs/vectors GROW with K, matching how a real
corpus scales) into a scratch dir, then times representative queries
at each K. Near-linear wall-clock growth = the plans have no
super-linear term (quadratic self-join, single-task sort) hiding at
bench scale — the measurable proxy for the 100 TB stance.

Usage: python scale_probe.py [K ...]   (default 1 4 10)
Prints one JSON line per K and writes SCALEPROBE.md.

Noise handling (VERDICT r4 #5): this box's same-plan wall-clock for a
fixed query varies up to ~18x between consecutive runs (measured:
[50.0, 8.3, 11.0, 27.8, 6.1, 2.7] s for one identical adaptive plan),
so per-K timings are best-of-N with the repetitions ROUND-ROBINED
across queries — a noise burst then inflates one sample of every
query instead of every sample of one query. The probe also records
each query's join strategies per K, so a ratio anomaly can be
attributed (plan flip vs noise) from the .md alone.
"""

from __future__ import annotations

import json
import os
import random as _random
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from clickhouse_realtime_analytics_demo_spark.catalog import table  # noqa: E402
from clickhouse_realtime_analytics_demo_spark.queries import all_queries  # noqa: E402
from clickhouse_realtime_analytics_demo_spark.session import get_spark  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
QUERIES = (
    "daily_events",
    "event_type_stats",
    "user_rfm",
    "dedup_exact",
    "ann_cosine_topk",
    # the three joins that dropped forced broadcast hints (round 4):
    # confirm the AQE shuffle-join fallback scales
    "segment_revenue",
    "nation_revenue",
    "top_parts_per_brand",
    # round 5: gap sessionization (user-partitioned window chain),
    # the gateway dictionary path, basket pairs, sampling, and the
    # flagship LSH dedup (shingle explode -> min-agg -> banded join)
    "gap_sessions_stats",
    "dict_lookup_defaults",
    "copurchased_parts",
    "doc_sample_stratified",
    "dedup_minhash",
    # round 6: eval-set decontamination (probe side broadcasts, corpus
    # side narrow — expect ~linear)
    "contamination_check",
)
# Entity key spaces: shift amount = max(key)+1 from the OWNING table,
# applied to every referencing column, so copy i of a fact references
# copy i of its dimension (FK-consistent growth — users/customers/
# parts/orders all GROW with K, matching how a real corpus scales).
ENTITIES = {
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
    "custkey": ("customer", "c_custkey"),
    "orderkey": ("orders", "o_orderkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
}
# table -> {column: entity}
REPLICATE = {
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
    "customer": {"c_custkey": "custkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey"},
    "part": {"p_partkey": "partkey"},
    # s_nationkey references the bounded nation dim — unshifted
    "supplier": {"s_suppkey": "suppkey"},
}
# bounded dims: copied once, never replicated (their cardinality is
# scale-invariant — catalog.BOUNDED_DIMS)
COPY = ("nation", "region")


def replicate(spark, out_dir: str, k: int, only: tuple[str, ...] | None = None) -> None:
    """Grow the lake K× FK-consistently. ``only`` limits which
    replicated tables are written (bounded dims still copied) — probes
    touching a single table shouldn't pay for growing all nine."""
    shifts = {
        ent: table(spark, BASE_SF, tab).agg(F.max(col)).collect()[0][0] + 1
        for ent, (tab, col) in ENTITIES.items()
    }
    letters = "abcdefghijklmnopqrstuvwxyz"
    digits = "0123456789"
    seen_perms: set = set()
    todo = {n: c for n, c in REPLICATE.items() if only is None or n in only}
    for name, col_entities in todo.items():
        src = table(spark, BASE_SF, name)
        parts = []
        for i in range(k):
            df = src
            for c, ent in col_entities.items():
                df = df.withColumn(c, (F.col(c) + F.lit(i * shifts[ent])).cast("long"))
            if name == "documents" and i:
                # Grow the corpus with NEW content, not K identical
                # copies: a per-copy substitution cipher (length-
                # preserving) gives each copy disjoint shingle sets.
                # Without this, every doc forms a K-clique of TRUE
                # near-duplicates and the correct near-dup output
                # itself is quadratic in K — the first probe run
                # measured dedup_minhash at 213x for 100x "data"
                # purely because the planted output had ~25M pairs; no
                # algorithm is sub-quadratic in its output.
                # r16: per-copy SEEDED RANDOM PERMUTATIONS of the
                # letter and digit alphabets, replacing the rotation
                # cipher. Rotations have period 25 (letters) / 10
                # (digits), so at K > 25 the old map repeated:
                # letter-only docs were IDENTICAL across copies
                # {1, 26, 51, 76} and digit-only docs formed 24-cliques
                # across copies 1..24 (lrot = 1+(i-1)%25 collides at
                # i ≡ j mod 25; drot = (i//25)%10 is constant within a
                # 25-copy stripe) — the corpusprep100 probe measured
                # the planted artifact as 4.95M "true" pairs at k=100
                # (463x the 1x count; genuinely disjoint copies grow
                # true pairs ~linearly) and the bucket cap then dropped
                # the planted mega-cliques, reading as 80.7% recall.
                # Full-alphabet permutations break every gram (not
                # just a shifted window), and distinctness across
                # copies is ASSERTED at build time instead of argued.
                rng = _random.Random(0xC0FFEE + i)
                lperm = list(letters)
                rng.shuffle(lperm)
                dperm = list(digits)
                rng.shuffle(dperm)
                key = ("".join(lperm), "".join(dperm))
                assert key != (letters, digits) and key not in seen_perms, (
                    f"copy {i}: cipher permutation collides; reseed"
                )
                seen_perms.add(key)
                src_chars = letters + letters.upper() + digits
                dst_chars = key[0] + key[0].upper() + key[1]
                df = df.withColumn("text", F.translate("text", src_chars, dst_chars))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # keep output file sizes sane: a K-way union would otherwise
        # write K x source-partition tiny files and the probe would
        # measure file-listing overhead, not plan behavior
        out.repartition(max(4, min(64, 2 * k))).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
    for name in COPY:
        table(spark, BASE_SF, name).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )


ROUNDS = 4  # best-of-N, round-robined across queries (see docstring)

_JOIN_NODES = ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")


def _join_mix(df) -> str:
    """Compact join-strategy signature of the executed adaptive plan,
    e.g. 'BHJx4' or 'BHJx2+SMJx2' — enough to spot an AQE flip."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    counts = {n: len(re.findall(n, plan)) for n in _JOIN_NODES}
    sig = "+".join(
        f"{''.join(w[0] for w in re.findall('[A-Z][a-z]*', n))}x{c}"
        for n, c in counts.items()
        if c
    )
    return sig or "none"


def _splice_section(text: str, marker: str) -> tuple[str, str]:
    """(before, after) around this writer's OWN section: ``before``
    ends where the section starts (or at EOF if absent), ``after`` is
    everything from the NEXT "## " heading on — so re-running one
    probe mode never discards the sections other modes wrote (a cc
    re-run once chopped every section after it)."""
    if marker not in text:
        return text.rstrip(), ""
    start = text.index(marker)
    nxt = text.find("\n## ", start + len(marker))
    after = text[nxt:] if nxt != -1 else ""
    return text[:start].rstrip(), after



def mv_probe(spark, part_counts=(8, 32, 64, 128, 256, 512), rows_per_batch=200) -> list[dict]:
    """Probe the MV maintenance path vs accumulated part count
    (VERDICT r5 next-round #2 — the streaming half of X8's claim).

    Grows one MV (daily_user_activity) batch by batch with the real
    sink write (``mv.write_batch``: partial agg + coalesce(1) part),
    and at each checkpoint measures:

    - append cost for the NEXT micro-batch (expected flat — the sink
      never lists existing parts);
    - ``read_final`` latency (expected ~linear in parts: listing +
      per-file open dominates at small part sizes);
    - ``compact()`` wall-clock from that many parts (on a COPY — the
      probe must not fold the table it is still growing), and
      ``read_final`` after compaction (expected flat, the floor).

    rows_per_batch=200 ≈ one 2 s INSERT block at the reference rate,
    so part counts 8..512 span ~16 s .. ~17 min of uncompacted live
    ingest. The derived cadence policy lives in mv.compact's docstring.
    """
    import shutil as _sh
    import tempfile as _tf

    from clickhouse_realtime_analytics_demo_spark.sources import generator
    from clickhouse_realtime_analytics_demo_spark.streaming import mv

    spec = mv.mv_specs()["daily_user_activity"]
    root = _tf.mkdtemp(prefix="mvprobe_")
    mv_path = f"{root}/mv"
    out = []
    written = 0
    for target in part_counts:
        while written < target:
            batch = generator.events(
                spark, n=rows_per_batch, n_users=500, seed=3000 + written,
                partitions=1, id_offset=written * rows_per_batch,
            )
            mv.write_batch(batch, spec, mv_path, written)
            written += 1
        # append cost at this part count (the next batch), best-of-3
        t_append = float("inf")
        for r in range(3):
            batch = generator.events(
                spark, n=rows_per_batch, n_users=500, seed=9000 + written,
                partitions=1, id_offset=written * rows_per_batch,
            )
            t0 = time.perf_counter()
            mv.write_batch(batch, spec, mv_path, written)
            t_append = min(t_append, time.perf_counter() - t0)
            written += 1
        # read_final at this part count, best-of-3
        t_read = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            mv.read_final(spark, mv_path, spec).agg(
                F.sum("total_events")
            ).collect()
            t_read = min(t_read, time.perf_counter() - t0)
        # compact a copy; measure fold cost and the post-compact read
        cp = f"{root}/cp{written}"
        _sh.copytree(mv_path, cp)
        t0 = time.perf_counter()
        mv.compact(spark, cp, spec)
        t_compact = time.perf_counter() - t0
        t_read_after = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            mv.read_final(spark, cp, spec).agg(F.sum("total_events")).collect()
            t_read_after = min(t_read_after, time.perf_counter() - t0)
        _sh.rmtree(cp, ignore_errors=True)
        row = {
            "parts": written,
            "append_ms": round(t_append * 1000, 1),
            "read_final_ms": round(t_read * 1000, 1),
            "compact_s": round(t_compact, 2),
            "read_after_compact_ms": round(t_read_after * 1000, 1),
        }
        out.append(row)
        print(json.dumps({"mv_probe": row}), flush=True)
    _sh.rmtree(root, ignore_errors=True)
    return out


def funnel_state_probe(
    spark,
    user_counts=(200, 2_000, 20_000),
    batches=40,
    rows_per_batch=1_000,
    retain_days=30,
) -> list[dict]:
    """State growth for the per-(user,day) funnel MV at 1×/10×/100× key
    cardinality (VERDICT r7 #7 — SURVEY §7's flagged hard part).

    This engine's MVs keep NO streaming state store (partials append
    per micro-batch; the MV table IS the state), so there is no
    watermark to size. The probe measures the quantities that replace
    state-store size and watermark setting:

    - per-batch append latency at full cardinality (must be FLAT in
      total key count — a batch only aggregates its own rows);
    - MV live rows = the state (must track DISTINCT KEYS TOUCHED,
      saturating at |users| × 90 generated days, not input rows);
    - ``read_final`` / ``compact`` latency vs cardinality;
    - the TTL bound: ``compact(retain_where=event_date >= cutoff)``
      — the ClickHouse ``TTL ... DELETE`` analog — with the resulting
      state reduction, codifying steady-state rows =
      retention_days × |daily active keys|.

    Events span 90 generated days, so the low-cardinality arm
    SATURATES its keyspace (200 users × 90 d = 18k keys < 40k input
    rows): state stops growing with input exactly when the bound
    predicts, while the high arm keeps ~1 key/row.
    """
    import shutil as _sh
    import tempfile as _tf

    from clickhouse_realtime_analytics_demo_spark.sources import generator
    from clickhouse_realtime_analytics_demo_spark.streaming import mv

    spec = mv.mv_specs()["mv_user_funnel"]
    out = []
    for n_users in user_counts:
        root = _tf.mkdtemp(prefix=f"funnelstate_{n_users}_")
        path = f"{root}/mv"
        written = 0
        for _ in range(batches):
            batch = generator.events(
                spark, n=rows_per_batch, n_users=n_users, seed=7000 + written,
                partitions=1, id_offset=written * rows_per_batch,
            )
            mv.write_batch(batch, spec, path, written)
            written += 1
        t_append = float("inf")
        for _ in range(3):
            batch = generator.events(
                spark, n=rows_per_batch, n_users=n_users, seed=7000 + written,
                partitions=1, id_offset=written * rows_per_batch,
            )
            t0 = time.perf_counter()
            mv.write_batch(batch, spec, path, written)
            t_append = min(t_append, time.perf_counter() - t0)
            written += 1
        partials = mv._read_partials(spark, path, spec)
        live_rows = partials.count()
        state_keys = partials.select(*spec.keys).distinct().count()
        t_read = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            mv.read_final(spark, path, spec).agg(F.sum("total_events")).collect()
            t_read = min(t_read, time.perf_counter() - t0)
        t0 = time.perf_counter()
        mv.compact(spark, path, spec)
        t_compact = time.perf_counter() - t0
        rows_folded = mv._read_partials(spark, path, spec).count()
        # TTL fold: retain only the trailing retain_days of the
        # 90-day generated window
        cutoff = (
            mv._read_partials(spark, path, spec)
            .select(F.date_sub(F.max("event_date"), retain_days - 1).alias("c"))
            .collect()[0]["c"]
        )
        t0 = time.perf_counter()
        mv.compact(spark, path, spec, retain_where=F.col("event_date") >= F.lit(cutoff))
        t_ttl = time.perf_counter() - t0
        rows_retained = mv._read_partials(spark, path, spec).count()
        row = {
            "users": n_users,
            "keyspace": n_users * 90,
            "input_rows": written * rows_per_batch,
            "state_rows": live_rows,
            "state_keys": state_keys,
            "append_ms": round(t_append * 1000, 1),
            "read_final_ms": round(t_read * 1000, 1),
            "compact_s": round(t_compact, 2),
            "rows_folded": rows_folded,
            "ttl_fold_s": round(t_ttl, 2),
            "rows_retained": rows_retained,
        }
        out.append(row)
        print(json.dumps({"funnel_state_probe": row}), flush=True)
        _sh.rmtree(root, ignore_errors=True)
    return out


def corpusprep_probe(
    spark, ks_exact=(1, 2, 4), ks_lsh=(1, 2, 4, 10)
) -> list[dict]:
    """Exact blocked pair generation vs the LSH composition as the
    corpus grows — VERDICT r7 #1's scale argument, MEASURED instead of
    asserted.

    `replicate` grows documents with per-copy substitution ciphers, so
    copies contribute DISJOINT shingle content (true near-dup pairs
    grow ~linearly) while the (source, lang) BLOCK VALUES are shared —
    blocks grow linearly with K, which is precisely the exact form's
    hazard: its pair stage is Σ block², so its wall-clock should bend
    ~quadratically in K. The LSH form's buckets are CONTENT-keyed
    (cipher copies never collide) and valve-capped, so its cost is
    Σ bucket² ∝ K. Exact is capped at K=4 by design (the quadratic arm
    is the thing being demonstrated); both run the FULL registered
    pipeline (pair gen + CC keep-one + sample + stats), best-of-2.
    """
    registry = all_queries()
    out = []
    for k in sorted(set(ks_exact) | set(ks_lsh)):
        d = tempfile.mkdtemp(prefix=f"cpp_k{k}_")
        replicate(spark, d, k, only=("documents",))
        row: dict = {"k": k}
        for name, ks in (
            ("corpus_prep_pipeline", ks_exact),
            ("corpus_prep_pipeline_lsh", ks_lsh),
        ):
            if k not in ks:
                continue
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                registry[name].fn(spark, d).collect()
                best = min(best, time.perf_counter() - t0)
            row["exact_s" if name == "corpus_prep_pipeline" else "lsh_s"] = round(
                best, 2
            )
        out.append(row)
        print(json.dumps({"corpusprep_probe": row}), flush=True)
        shutil.rmtree(d, ignore_errors=True)
    return out


def corpusprep40_probe(spark, k: int = 40) -> dict:
    """Round-10 (VERDICT r9 #4): one 40× point for the LSH pipeline
    linearity claim, plus the bucket-occupancy histogram and a MEASURED
    recall statement for the ``max_bucket_size=64`` valve at that
    scale.

    The valve drops a (band, hash, block) bucket when more than 64 docs
    collide in it; a TRUE pair is lost only if EVERY band it collides
    in is over-cap. Rather than inferring that from the histogram, this
    probe computes it exactly: candidate pairs with the valve vs
    without, then exact-Jaccard-verifies ONLY the dropped pairs (a
    dropped-set-sized job) to count real ≥0.6 pairs the valve cost."""
    from clickhouse_realtime_analytics_demo_spark.operators import dedup as _dedup
    from clickhouse_realtime_analytics_demo_spark.queries.graphops import (
        _prep_filtered,
    )

    registry = all_queries()
    d = tempfile.mkdtemp(prefix=f"cpp40_k{k}_")
    replicate(spark, d, k, only=("documents",))
    out: dict = {"k": k}

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        registry["corpus_prep_pipeline_lsh"].fn(spark, d).collect()
        best = min(best, time.perf_counter() - t0)
    out["lsh_s"] = round(best, 2)

    # ---- bucket occupancy at 40×: the pipeline's exact LSH stage
    # (16 bands over char-3-gram MinHash(32), block-confined buckets)
    _, blocked = _prep_filtered(spark, d)
    out["docs"] = blocked.count()
    sh = _dedup.char_ngram_sets(
        blocked.repartition(64, "doc_id"), "text", "doc_id", 3, keep=("blk",)
    ).localCheckpoint()
    sigs = _dedup.minhash_signatures_from_sets(
        sh, 32, keep=("blk",), materialized=True
    ).localCheckpoint()
    rows_per_band = 32 // 16
    from clickhouse_realtime_analytics_demo_spark.operators.dedup import band_hash_expr

    band_structs = [
        F.struct(F.lit(b).alias("band"), band_hash_expr(b, rows_per_band).alias("band_hash"))
        for b in range(16)
    ]
    bucketed = sigs.select(
        "id", "blk", F.explode_outer(F.array(*band_structs)).alias("bucket")
    ).select("id", "blk", "bucket.band", "bucket.band_hash")
    sizes = bucketed.groupBy("band", "band_hash", "blk").agg(F.count("*").alias("n"))
    hist = (
        sizes.select(
            F.when(F.col("n") == 1, "1")
            .when(F.col("n") <= 4, "2-4")
            .when(F.col("n") <= 16, "5-16")
            .when(F.col("n") <= 64, "17-64")
            .otherwise(">64")
            .alias("bin"),
            "n",
        )
        .groupBy("bin")
        .agg(F.count("*").alias("buckets"), F.sum("n").alias("entries"))
        .collect()
    )
    out["bucket_hist"] = {
        r["bin"]: {"buckets": int(r["buckets"]), "entries": int(r["entries"])} for r in hist
    }
    total_entries = sum(v["entries"] for v in out["bucket_hist"].values())
    over = out["bucket_hist"].get(">64", {"entries": 0})["entries"]
    out["entries_over_cap_pct"] = round(100.0 * over / total_entries, 3) if total_entries else 0.0

    # ---- measured valve recall: verify exactly the DROPPED pairs
    capped = _dedup.lsh_candidates_from_sigs(sigs, 32, 16, 64, "blk").localCheckpoint()
    uncapped = _dedup.lsh_candidates_from_sigs(sigs, 32, 16, None, "blk").localCheckpoint()
    out["cand_pairs_capped"] = capped.count()
    out["cand_pairs_uncapped"] = uncapped.count()
    dropped = uncapped.join(capped, ["id_a", "id_b"], "left_anti").localCheckpoint()
    out["cand_pairs_dropped"] = dropped.count()
    sh_sets = sh.select(F.col("id"), F.col("sh"))
    attached = (
        dropped.join(sh_sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sa"), "id_a")
        .join(sh_sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sb"), "id_b")
        .repartition(64)
    )
    out["true_pairs_dropped"] = attached.filter(
        _dedup.jaccard(F.col("sa"), F.col("sb")) >= 0.6
    ).count()
    # denominator for the recall statement: true pairs the capped run finds
    cap_attached = (
        capped.join(sh_sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sa"), "id_a")
        .join(sh_sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sb"), "id_b")
        .repartition(64)
    )
    out["true_pairs_capped"] = cap_attached.filter(
        _dedup.jaccard(F.col("sa"), F.col("sb")) >= 0.6
    ).count()
    tot_true = out["true_pairs_capped"] + out["true_pairs_dropped"]
    out["valve_recall_pct"] = (
        round(100.0 * out["true_pairs_capped"] / tot_true, 3) if tot_true else 100.0
    )
    print(json.dumps({"corpusprep40_probe": out}), flush=True)
    shutil.rmtree(d, ignore_errors=True)
    return out


def lshsplit_probe(spark, k: int = 40) -> dict:
    """Round-10 follow-through on the 40× valve-recall finding: the
    drop valve cost 7.73% of TRUE pairs (92.27% recall). This measures
    the ``split_depth`` refinement (over-cap buckets re-partitioned by
    another band's hash instead of dropped) at the same 40× point:
    candidate counts, TRUE-pair recall vs the uncapped union, and the
    candidate-generation wall per variant."""
    from clickhouse_realtime_analytics_demo_spark.operators import dedup as _dedup
    from clickhouse_realtime_analytics_demo_spark.queries.graphops import (
        _prep_filtered,
    )

    d = tempfile.mkdtemp(prefix=f"lshsplit_k{k}_")
    replicate(spark, d, k, only=("documents",))
    out: dict = {"k": k}
    _, blocked = _prep_filtered(spark, d)
    out["docs"] = blocked.count()
    sh = _dedup.char_ngram_sets(
        blocked.repartition(160, "doc_id"), "text", "doc_id", 3, keep=("blk",)
    ).localCheckpoint()
    sigs = _dedup.minhash_signatures_from_sets(
        sh, 32, keep=("blk",), materialized=True
    ).localCheckpoint()
    sh_sets = sh.select("id", "sh")

    def _true(cands):
        attached = (
            cands.join(
                sh_sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sa"),
                "id_a",
            )
            .join(
                sh_sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sb"),
                "id_b",
            )
            .repartition(160)
        )
        return attached.filter(_dedup.jaccard(F.col("sa"), F.col("sb")) >= 0.6).count()

    variants = {
        "capped": dict(max_bucket_size=64, split_depth=0),
        "split1": dict(max_bucket_size=64, split_depth=1),
        "split2": dict(max_bucket_size=64, split_depth=2),
        # r11: the adaptive default — the histogram decides the depth
        "adaptive": dict(max_bucket_size=64, split_depth=None),
        "uncapped": dict(max_bucket_size=None, split_depth=0),
    }
    for name, kw in variants.items():
        t0 = time.perf_counter()
        cands = _dedup.lsh_candidates_from_sigs(sigs, 32, 16, block_col="blk", **kw)
        cands = cands.localCheckpoint()
        n = cands.count()
        gen_s = round(time.perf_counter() - t0, 2)
        out[name] = {"cand_pairs": n, "gen_s": gen_s, "true_pairs": _true(cands)}
        if name == "adaptive":
            out[name]["decision"] = dict(_dedup.last_adaptive)
        print(json.dumps({"lshsplit_variant": {name: out[name]}}), flush=True)
    # the other half of the adaptive claim: at 1× (sf0.1 itself) the
    # over-cap share is tiny and the default must stay at depth 0
    _, blocked1 = _prep_filtered(spark, BASE_SF)
    sh1 = _dedup.char_ngram_sets(
        blocked1.repartition(32, "doc_id"), "text", "doc_id", 3, keep=("blk",)
    ).localCheckpoint()
    sigs1 = _dedup.minhash_signatures_from_sets(
        sh1, 32, keep=("blk",), materialized=True
    ).localCheckpoint()
    _dedup.lsh_candidates_from_sigs(
        sigs1, 32, 16, max_bucket_size=64, block_col="blk", split_depth=None
    ).count()
    out["adaptive_1x"] = dict(_dedup.last_adaptive)
    print(json.dumps({"lshsplit_adaptive_1x": out["adaptive_1x"]}), flush=True)
    total_true = out["uncapped"]["true_pairs"]
    for name in variants:
        out[name]["recall_pct"] = (
            round(100.0 * out[name]["true_pairs"] / total_true, 3) if total_true else 100.0
        )
    print(json.dumps({"lshsplit_probe": out}), flush=True)
    shutil.rmtree(d, ignore_errors=True)
    return out


def write_lshsplit_section(row: dict) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## Bucket-split refinement vs the drop valve (40×)"
    text, tail_sections = _splice_section(text, marker)
    lines = [
        marker.strip(),
        "",
        f"`scale_probe.py lshsplit` (r10): the `split_depth` refinement at "
        f"K={row['k']} ({row['docs']} filtered docs). Over-cap buckets are "
        "re-partitioned by another band's hash (bounded depth) instead of "
        "dropped; refined sub-buckets are pairwise band-intersections, so "
        "recovery targets exactly the pairs whose every band bucket is "
        "over cap (`tests/test_dedup_cap.py` pins the geometry).",
        "",
        "| variant | candidate pairs | true (J≥0.6) pairs | recall | gen wall (s) |",
        "|---|---|---|---|---|",
    ]
    for name in ("capped", "split1", "split2", "adaptive", "uncapped"):
        v = row.get(name)
        if v is None:
            continue
        label = name
        if name == "adaptive" and "decision" in v:
            label = (
                f"adaptive (picked depth {v['decision'].get('depth')}, "
                f"share {round(100 * v['decision'].get('share', 0), 2)}%)"
            )
        lines.append(
            f"| {label} | {v['cand_pairs']} | {v['true_pairs']} | "
            f"{v['recall_pct']}% | {v['gen_s']} |"
        )
    if "adaptive_1x" in row:
        a1 = row["adaptive_1x"]
        lines += [
            "",
            f"Adaptive default at 1× (sf0.1 itself): over-cap entry share "
            f"{round(100 * a1.get('share', 0), 3)}% → picked depth "
            f"{a1.get('depth')} (threshold 2%) — the knob engages exactly "
            "where the r10 measurements said it pays, with no manual "
            "setting per corpus.",
        ]
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def write_corpusprep40_section(row: dict) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## LSH pipeline at 40× + bucket-valve recall"
    text, tail_sections = _splice_section(text, marker)
    hist = " · ".join(
        f"{b}: {v['buckets']} buckets / {v['entries']} entries"
        for b, v in sorted(row["bucket_hist"].items())
    )
    lines = [
        marker.strip(),
        "",
        f"`scale_probe.py corpusprep40` (r10, VERDICT r9 #4): "
        f"`corpus_prep_pipeline_lsh` at K={row['k']} "
        f"({row['docs']} filtered docs): **{row['lsh_s']} s** best-of-2.",
        "",
        f"- Bucket occupancy (16 bands × block-confined): {hist}",
        f"- Entries in over-cap (>64) buckets: {row['entries_over_cap_pct']}%",
        f"- Candidate pairs: {row['cand_pairs_capped']} capped vs "
        f"{row['cand_pairs_uncapped']} uncapped → {row['cand_pairs_dropped']} dropped",
        f"- TRUE (J≥0.6) pairs among dropped candidates: {row['true_pairs_dropped']} "
        f"vs {row['true_pairs_capped']} found with the valve → "
        f"**valve recall {row['valve_recall_pct']}% at 40×**",
    ]
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def _reclaim(spark) -> None:
    """Release checkpoint/shuffle storage between heavy phases: drop
    the Python references, then nudge the JVM GC so the
    ContextCleaner frees localCheckpoint blocks and shuffle files —
    the first 100x rung ran /tmp out of disk (ENOSPC) when two
    pipeline executions' eager-checkpoint blocks piled up unreleased."""
    import gc

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001 — best-effort
        pass
    time.sleep(3.0)


def corpusprep100_probe(spark, ks=(40, 100)) -> dict:
    """r15 (VERDICT r14 #5): the LSH corpus-prep pipeline one rung past
    40x, under the ENGINE's own sizing — no hand-set partitions
    anywhere (the r10 40x runs swept ``shuffle_partitions = 4 x k``;
    the operator now derives its spread from the corpus bytes via
    ``session.spread_partitions`` and the session owns the AQE shuffle
    ceiling). Measures, in ONE session:

    - pipeline wall at k=40 (the anchor, re-measured apples-to-apples)
      and k=100, INTERLEAVED best-of-2 each (A B A B, r16): this box
      documented a bimodal host mode that swings ±35-60% on identical
      configs over minutes — timing each rung in its own contiguous
      window lets one mode shift land entirely between the rungs and
      fabricate (or mask) a super-linear ratio, which is exactly what
      attempt 4 measured (anchor in fast mode, rung in slow mode,
      5.06x for 2.5x data on a pipeline whose pair volume grew
      linearly). Alternating runs gives both rungs the same exposure
      to both modes; per-rung min is the estimator, as everywhere
      else in this repo's ABBA protocol;
    - sub-linearity: wall(100) <= 1.5 x linear extrapolation from the
      measured 40x anchor (ASSERTED — the probe is the regression
      gate, same policy as asofsf6);
    - recall at 100x with the ADAPTIVE split depth engaged: TRUE
      (J>=0.6) pairs found by the adaptive candidate generation vs
      the uncapped union, counted by exact-verifying the DROPPED
      candidates (the corpusprep40 method), ASSERTED >= 95%.
    """
    from clickhouse_realtime_analytics_demo_spark.operators import dedup as _dedup
    from clickhouse_realtime_analytics_demo_spark.queries.graphops import (
        _prep_filtered,
    )
    from clickhouse_realtime_analytics_demo_spark.session import spread_partitions

    registry = all_queries()
    out: dict = {"ks": list(ks)}
    walls: dict[int, float] = {}
    k_top = max(ks)
    dirs: dict[int, str] = {}
    for k in ks:
        dirs[k] = tempfile.mkdtemp(prefix=f"cpp100_k{k}_")
        t0 = time.perf_counter()
        replicate(spark, dirs[k], k, only=("documents",))
        print(
            json.dumps(
                {"corpusprep100_build": {"k": k, "build_s": round(time.perf_counter() - t0, 1)}}
            ),
            flush=True,
        )
    for leg in range(2):
        for k in ks:  # A B A B: both rungs see both host modes
            t0 = time.perf_counter()
            registry["corpus_prep_pipeline_lsh"].fn(spark, dirs[k]).collect()
            dt = round(time.perf_counter() - t0, 2)
            walls[k] = min(walls.get(k, float("inf")), dt)
            _reclaim(spark)  # free this run's checkpoints before the next
            print(
                json.dumps({"corpusprep100_wall": {"k": k, "leg": leg, "wall_s": dt}}),
                flush=True,
            )
    for k in ks:
        if k != k_top:
            shutil.rmtree(dirs[k], ignore_errors=True)
    d = dirs[k_top]
    # ---- recall at the top rung, adaptive split engaged, engine
    # sizing for every explicit spread
    _, blocked = _prep_filtered(spark, d)
    out["docs"] = blocked.count()
    n_spread = spread_partitions(
        blocked, target_bytes=_dedup.SHINGLE_SPREAD_SOURCE_BYTES
    )
    out["spread_partitions"] = n_spread
    sh = _dedup.char_ngram_sets(
        blocked.repartition(n_spread, "doc_id"), "text", "doc_id", 3, keep=("blk",)
    ).localCheckpoint()
    sigs = _dedup.minhash_signatures_from_sets(
        sh, 32, keep=("blk",), materialized=True
    ).localCheckpoint()
    sh_sets = sh.select("id", "sh")

    def _true(cands):
        # explicit keyed spread BEFORE each join (the 100x OOM
        # lesson, see dedup.minhash_char_dedup_pairs): shingle
        # arrays expand ~10x in memory, AQE byte-coalescing packs
        # too much per task. r16: the spread follows the PAIR
        # count (dedup.attach_partitions — the same probe-found
        # rule the operator now applies), since attach bytes track
        # pairs, not corpus bytes; cands is checkpointed at both
        # call sites so the count is one bounded job.
        n_att = _dedup.attach_partitions(cands.count(), n_spread)
        attached = (
            cands.repartition(n_att, "id_a")
            .join(
                sh_sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sa"),
                "id_a",
            )
            .repartition(n_att, "id_b")
            .join(
                sh_sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sb"),
                "id_b",
            )
            # no further repartition: the join output already sits
            # on the n_att keyed spread, and a third exchange here
            # would shuffle BOTH arrays (the ENOSPC term at 100x)
        )
        return attached.filter(
            _dedup.jaccard(F.col("sa"), F.col("sb")) >= 0.6
        ).count()

    t0 = time.perf_counter()
    adaptive = _dedup.lsh_candidates_from_sigs(
        sigs, 32, 16, max_bucket_size=64, block_col="blk", split_depth=None
    ).localCheckpoint()
    out["adaptive_gen_s"] = round(time.perf_counter() - t0, 2)
    out["adaptive_decision"] = dict(_dedup.last_adaptive)
    uncapped = _dedup.lsh_candidates_from_sigs(
        sigs, 32, 16, max_bucket_size=None, block_col="blk", split_depth=0
    ).localCheckpoint()
    out["cand_pairs_adaptive"] = adaptive.count()
    out["cand_pairs_uncapped"] = uncapped.count()
    dropped = uncapped.join(
        adaptive, ["id_a", "id_b"], "left_anti"
    ).localCheckpoint()
    out["cand_pairs_dropped"] = dropped.count()
    out["true_pairs_dropped"] = _true(dropped)
    _reclaim(spark)  # the dropped-verify shuffle is large at 100x
    out["true_pairs_adaptive"] = _true(adaptive)
    tot = out["true_pairs_adaptive"] + out["true_pairs_dropped"]
    out["recall_pct"] = round(100.0 * out["true_pairs_adaptive"] / tot, 3) if tot else 100.0
    shutil.rmtree(d, ignore_errors=True)

    out["walls"] = walls
    k_lo = min(ks)
    linear = walls[k_lo] * (k_top / k_lo)
    out["vs_linear"] = round(walls[k_top] / linear, 3)
    print(json.dumps({"corpusprep100_probe": out}), flush=True)
    assert out["vs_linear"] <= 1.5, (
        f"LSH pipeline at {k_top}x is {out['vs_linear']}x the linear "
        f"extrapolation from the measured {k_lo}x anchor"
    )
    assert out["recall_pct"] >= 95.0, (
        f"adaptive-split recall fell to {out['recall_pct']}% at {k_top}x"
    )
    return out


def write_corpusprep100_section(row: dict) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## LSH pipeline at 100× under engine-owned sizing"
    text, tail_sections = _splice_section(text, marker)
    walls = row["walls"]
    ks = sorted(int(k) for k in walls)
    k_lo, k_hi = ks[0], ks[-1]
    dec = row.get("adaptive_decision", {})
    lines = [
        marker.strip(),
        "",
        f"`scale_probe.py corpusprep100` (r15, VERDICT r14 #5; run to "
        f"completion r16): `corpus_prep_pipeline_lsh` at K={k_lo} and "
        f"K={k_hi} ({row['docs']} filtered docs at {k_hi}x), "
        "INTERLEAVED best-of-2 per rung (A B A B — both rungs see both "
        "of this box's documented host modes; per-rung min), ONE "
        "session, ZERO hand-set partitions — the operator derives its "
        "shingle-block spread from the corpus bytes "
        f"(`session.spread_partitions` → {row['spread_partitions']} "
        f"partitions at {k_hi}x; the r10 rungs hand-swept 4 x K), the "
        "verify-attach spread from the measured candidate-pair count "
        "(`dedup.attach_partitions`, the r16 probe-found rule), and "
        "the session owns the AQE shuffle ceiling.",
        "",
        f"- Pipeline wall: **{walls[k_lo]} s at {k_lo}x → "
        f"{walls[k_hi]} s at {k_hi}x** = {row['vs_linear']}x the linear "
        f"extrapolation (gate <= 1.5x, asserted in the probe itself)",
        f"- Adaptive split decision at {k_hi}x: depth {dec.get('depth')} "
        f"(over-cap entry share {round(100 * dec.get('share', 0), 2)}%), "
        f"candidate gen {row['adaptive_gen_s']} s",
        f"- Candidates: {row['cand_pairs_adaptive']} adaptive vs "
        f"{row['cand_pairs_uncapped']} uncapped → "
        f"{row['cand_pairs_dropped']} dropped",
        f"- TRUE (J≥0.6) pairs: {row['true_pairs_adaptive']} found vs "
        f"{row['true_pairs_dropped']} lost in dropped candidates → "
        f"**recall {row['recall_pct']}% at {k_hi}x** (gate ≥95%, asserted)",
    ]
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def textops_probe(spark, ks=(1, 4, 10)) -> list[dict]:
    """Round-8 text ops vs corpus size: the vocabulary-rarity join
    (broadcast of the Zipf-bounded COMMON set — cost should be ~linear
    and the broadcast bounded) and overlapping chunking (narrow
    explode — ~linear). Also records the common-set size at each K:
    the broadcast bound in practice."""
    from clickhouse_realtime_analytics_demo_spark.operators import text as _text

    registry = all_queries()
    out = []
    for k in ks:
        d = tempfile.mkdtemp(prefix=f"textops_k{k}_")
        replicate(spark, d, k, only=("documents",))
        row: dict = {"k": k}
        docs = table(spark, d, "documents")
        toks = docs.filter(F.col("text").isNotNull()).select(
            F.explode_outer(_text.tokens(F.lower(F.col("text")))).alias("token")
        )
        row["common_tokens"] = (
            toks.groupBy("token").agg(F.count("*").alias("n")).filter(F.col("n") >= 5).count()
        )
        for name, key in (("doc_rare_token_stats", "rare_s"), ("doc_chunk_stats", "chunk_s")):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                registry[name].fn(spark, d).collect()
                best = min(best, time.perf_counter() - t0)
            row[key] = round(best, 2)
        out.append(row)
        print(json.dumps({"textops_probe": row}), flush=True)
        shutil.rmtree(d, ignore_errors=True)
    return out


def write_textops_section(rows: list[dict]) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## Round-8 text ops vs corpus size"
    text, tail_sections = _splice_section(text, marker)
    base = rows[0]
    lines = [
        marker.strip(),
        "",
        "`scale_probe.py textops`: the r8 vocabulary-rarity query"
        " (broadcast COMMON set + anti-hit) and overlapping chunking on"
        " cipher-replicated documents, best-of-3 warm. common_tokens ="
        " measured size of the broadcast side (the Zipf bound in"
        " practice: it grows far slower than the corpus because copies"
        " add NEW vocabulary whose per-copy counts sit below the"
        " threshold until enough copies share a gram).",
        "",
        "| K | docs | common tokens (broadcast side) | rarity query (s) | ratio | chunking query (s) | ratio |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['k']} | {r['k'] * 4792} | {r['common_tokens']} |"
            f" {r['rare_s']} | {round(r['rare_s'] / base['rare_s'], 1)}x |"
            f" {r['chunk_s']} | {round(r['chunk_s'] / base['chunk_s'], 1)}x |"
        )
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def bpe_probe(spark, ks=(1, 4, 10), num_merges=12) -> list[dict]:
    """Round-9 BPE tokenizer training vs corpus size: one corpus pass
    to a word vocabulary, then num_merges iterations of (pair-count
    shuffle over the vocabulary + top-1 + map-side rewrite). Cipher
    replication grows the WORD VOCABULARY ~linearly with K (each copy
    contributes disjoint words) — the stress axis that matters, since
    every iteration's cost is vocabulary-sized, not corpus-sized.
    Records the vocab size so the ratio column can be read against the
    thing that actually grew."""
    from clickhouse_realtime_analytics_demo_spark.operators import bpe as _bpe

    out = []
    for k in ks:
        d = tempfile.mkdtemp(prefix=f"bpe_k{k}_")
        replicate(spark, d, k, only=("documents",))
        docs = table(spark, d, "documents")
        row: dict = {"k": k, "vocab": _bpe.word_counts(docs).count()}
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            merges = _bpe.train_bpe(docs, num_merges)
            best = min(best, time.perf_counter() - t0)
        row["train_s"] = round(best, 2)
        row["merges"] = len(merges)
        out.append(row)
        print(json.dumps({"bpe_probe": row}), flush=True)
        shutil.rmtree(d, ignore_errors=True)
    return out


def write_bpe_section(rows: list[dict], num_merges: int = 12) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## BPE tokenizer training vs corpus size"
    text, tail_sections = _splice_section(text, marker)
    base = rows[0]
    lines = [
        marker.strip(),
        "",
        f"`scale_probe.py bpe`: operators/bpe.py train_bpe ({num_merges} merges)"
        " on cipher-replicated documents, best-of-2 warm. The cipher"
        " copies carry disjoint words, so the WORD VOCABULARY (the"
        " per-iteration working set) grows ~linearly with K — the"
        " honest stress for an operator whose corpus-sized work is one"
        " pass and whose iteration cost is vocabulary-sized. The"
        " driver holds only the merge table at every K.",
        "",
        "| K | docs | word vocab | train (s) | ratio |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['k']} | {r['k'] * 4792} | {r['vocab']} |"
            f" {r['train_s']} | {round(r['train_s'] / base['train_s'], 1)}x |"
        )
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def _synth_bpe_docs(spark, n: int):
    """Synthetic corpus of 15 hash-derived pseudo-words per doc
    (digits translated to [a-j], ≤7 chars) — grows the WORD VOCABULARY
    to the 10⁵ scale where the per-iteration pair-count shuffle
    carries real weight (the axis that grows at 100 TB)."""
    return spark.range(0, n, numPartitions=32).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(15)),
                lambda j: F.translate(
                    (F.abs(F.xxhash64(F.col("id"), j)) % 1_000_000).cast("string"),
                    "0123456789",
                    "abcdefghij",
                ),
            ),
            " ",
        ).alias("text"),
    ).localCheckpoint()


def bpe_synth_probe(spark, n_docs=(10_000, 40_000, 120_000), num_merges=12) -> list[dict]:
    """Round-9 BPE at a NON-degenerate vocabulary (the testdata corpus
    holds only 31 distinct words, so the documents-table probe mostly
    measures fixed iteration overhead): synthesize documents so the
    WORD VOCABULARY reaches the 10⁵ scale where the per-iteration
    pair-count shuffle carries real weight — the thing that grows on a
    100 TB corpus. Everything stays JVM expressions; fresh plan per
    timed run."""
    from clickhouse_realtime_analytics_demo_spark.operators import bpe as _bpe

    out = []
    for n in n_docs:
        docs = _synth_bpe_docs(spark, n)
        vocab = _bpe.word_counts(docs).count()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            merges = _bpe.train_bpe(docs, num_merges)
            best = min(best, time.perf_counter() - t0)
        row = {"docs": n, "vocab": vocab, "train_s": round(best, 2), "merges": len(merges)}
        out.append(row)
        print(json.dumps({"bpe_synth_probe": row}), flush=True)
        docs.unpersist()
    return out


def write_bpe_synth_section(rows: list[dict], num_merges: int = 12) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## BPE training vs vocabulary size (synthetic)"
    text, tail_sections = _splice_section(text, marker)
    base = rows[0]
    lines = [
        marker.strip(),
        "",
        f"`scale_probe.py bpesynth`: train_bpe ({num_merges} merges) on synthetic"
        " docs of hash-derived pseudo-words — the documents table's"
        " 31-word vocabulary is degenerate, so this is the probe that"
        " actually loads the per-iteration pair-count shuffle"
        " (vocabulary-sized, the axis that grows at 100 TB). Best-of-2,"
        " fresh plan per run.",
        "",
        "| docs | word vocab | train (s) | ratio | vocab ratio |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['docs']} | {r['vocab']} | {r['train_s']} |"
            f" {round(r['train_s'] / base['train_s'], 1)}x |"
            f" {round(r['vocab'] / base['vocab'], 1)}x |"
        )
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def tfidf_probe(spark, ks=(1, 4, 10, 40)) -> list[dict]:
    """Round-10: doc_tfidf_topk vs corpus size. Cipher replication
    grows the vocabulary ~linearly with K (disjoint content per copy),
    so this loads both shuffles that grow at 100 TB — the (doc, token)
    tf aggregate and the token-keyed tf⋈df join — plus the per-doc
    top-k window. Best-of-2, fresh plan per run; df (vocabulary) size
    recorded since it is the join's build side."""
    registry = all_queries()
    out = []
    for k in ks:
        d = tempfile.mkdtemp(prefix=f"tfidf_k{k}_")
        replicate(spark, d, k, only=("documents",))
        best = float("inf")
        rows = 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = len(registry["doc_tfidf_topk"].fn(spark, d).collect())
            best = min(best, time.perf_counter() - t0)
        row = {"k": k, "out_rows": rows, "tfidf_s": round(best, 2)}
        out.append(row)
        print(json.dumps({"tfidf_probe": row}), flush=True)
        shutil.rmtree(d, ignore_errors=True)
    return out


def write_tfidf_section(rows: list[dict]) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## TF-IDF top-k vs corpus size"
    text, tail_sections = _splice_section(text, marker)
    base = rows[0]
    lines = [
        marker.strip(),
        "",
        "`scale_probe.py tfidf` (r10): `doc_tfidf_topk` on cipher-replicated "
        "documents (vocabulary grows ~linearly with K — both the (doc, token) "
        "tf aggregate and the token-keyed tf⋈df join grow). Best-of-2, fresh "
        "plan per run.",
        "",
        "| K | output rows | wall (s) | ratio |",
        "|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['k']} | {r['out_rows']} | {r['tfidf_s']} |"
            f" {round(r['tfidf_s'] / base['tfidf_s'], 1)}x |"
        )
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def heavyhitters_probe(
    spark, n_rows: int = 8_000_000, key_spaces=(1_000, 100_000, 1_000_000, 4_000_000)
) -> list[dict]:
    """Round-11: exact top-20 keys, naive full-key-space shuffle vs the
    Misra-Gries candidate-pruned two-pass (operators/sketches.py).

    The testdata corpus can't carry this probe: the generator draws
    document text from a 31-word pool (measured: 31 distinct tokens at
    ALL three SFs, and events has 1,500 users), so every key fits one
    counter and both plans degenerate. The probe instead synthesizes a
    log-uniform (Zipf-shaped: p(rank) ∝ 1/rank) stream JVM-side —
    ``floor(exp(rand·ln(R)))`` — and walks the key space R while the
    row count stays fixed, which is the axis that separates the plans:
    the naive aggregation's shuffle keying grows with R, the MG
    recount stays bounded at counters × partitions candidates.
    Equality of the two top-20s is asserted on every rung; the 20th
    count ≈ N/(20·ln R) clears the exactness bound N/(counters+1) by
    ~2 orders.
    """
    from clickhouse_realtime_analytics_demo_spark.operators import sketches

    out = []
    for space in key_spaces:
        stream = spark.range(n_rows).select(
            F.concat(
                F.lit("k"),
                F.floor(F.exp(F.rand(seed=11) * float(__import__("math").log(space))))
                .cast("long")
                .cast("string"),
            ).alias("token")
        )
        distinct = stream.select("token").distinct().count()
        cands = (
            sketches.mg_candidates(stream, "token", counters=4096)
            .select("token")
            .distinct()
            .count()
        )

        def _naive():
            return (
                stream.groupBy("token")
                .agg(F.count("*").alias("cnt"))
                .orderBy(F.col("cnt").desc(), F.col("token").asc())
                .limit(20)
                .collect()
            )

        def _mg():
            return sketches.exact_heavy_hitters(
                stream, "token", k=20, counters=4096
            ).collect()

        naive_best = mg_best = float("inf")
        naive_rows = mg_rows = None
        for _ in range(2):
            t0 = time.perf_counter()
            naive_rows = _naive()
            naive_best = min(naive_best, time.perf_counter() - t0)
            t0 = time.perf_counter()
            mg_rows = _mg()
            mg_best = min(mg_best, time.perf_counter() - t0)
        assert [(r["token"], r["cnt"]) for r in mg_rows] == [
            (r["token"], r["cnt"]) for r in naive_rows
        ], f"heavy hitters diverged at key space {space}"
        row = {
            "key_space": space,
            "distinct": distinct,
            "candidates": cands,
            "naive_s": round(naive_best, 2),
            "mg_s": round(mg_best, 2),
        }
        out.append(row)
        print(json.dumps({"heavyhitters_probe": row}), flush=True)
    return out


def write_heavyhitters_section(rows: list[dict]) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## Heavy hitters: MG-pruned vs full-key-space shuffle"
    text, tail_sections = _splice_section(text, marker)
    lines = [
        marker.strip(),
        "",
        "`scale_probe.py heavyhitters` (r11): exact top-20 over an 8M-row "
        "log-uniform stream as the KEY SPACE grows (synthetic, JVM-generated: "
        "the testdata generator draws document text from a 31-word pool and "
        "events from 1,500 users — measured — so no real column exercises "
        "frequency sketching; the registered `doc_token_heavy_hitters` stays "
        "the oracle/correctness gate over real data). Naive = full groupBy + "
        "TakeOrdered (shuffle keyed by every distinct key); MG = Misra-Gries "
        "candidates (counters=4096) → broadcast semi prune → exact recount, "
        "output asserted equal on every rung. `distinct` is the naive "
        "shuffle's key count; `candidates` the MG recount's — the bounded-vs-"
        "growing divergence is the 100 TB story.",
        "",
        "| key space R | distinct keys | MG candidates | naive (s) | MG two-pass (s) |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['key_space']:,} | {r['distinct']:,} | {r['candidates']:,} |"
            f" {r['naive_s']} | {r['mg_s']} |"
        )
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def stateparts_probe(spark, part_counts=(8, 64, 256)) -> list[dict]:
    """Round-11: merge-on-read wall for the new mergeable states
    (topK, quantile) vs part count — the freshness-vs-parts trade the
    MV probe measured for sum/HLL partials, applied to the two new
    State/Merge members. Each rung writes N parts of ~500 rows
    (5 groups × 100-key child domain), reads best-of-2, compacts to
    one part, reads again; compacted reads must agree with pre-compact
    reads (asserted)."""
    import random as _random

    from clickhouse_realtime_analytics_demo_spark.streaming import (
        quantile_state,
        tdigest_state,
        topk_state,
    )

    rng = _random.Random(11)
    out = []
    for n_parts in part_counts:
        base = tempfile.mkdtemp(prefix=f"stateparts_{n_parts}_")
        tk, qt, td = f"{base}/topk", f"{base}/quant", f"{base}/tdig"
        td_state_rows = 0
        for i in range(n_parts):
            rows = [
                ("g%d" % rng.randrange(5), "c%d" % rng.randrange(100),
                 rng.randrange(0, 10_000))
                for _ in range(500)
            ]
            b = spark.createDataFrame(rows, "g string, child string, v long")
            topk_state.write_batch(b, ["g"], "child", tk, batch_id=i, counters=256)
            quantile_state.write_batch(b, ["g"], F.col("v"), qt, batch_id=i)
            # r12: the bounded t-digest sibling — CONTINUOUS value
            # (v + a fractional jitter would change the exact twin; the
            # sketch doesn't care, so the same v keys all three stores)
            tdigest_state.write_batch(b, ["g"], F.col("v"), td, batch_id=i)

        def _read_tk():
            return topk_state.read_topk(spark, tk, ["g"], k=5, counters=256).collect()

        def _read_qt():
            return quantile_state.read_quantiles(
                spark, qt, ["g"], [0.5, 0.95]
            ).collect()

        def _read_td():
            return tdigest_state.read_quantiles(
                spark, td, ["g"], [0.5, 0.95]
            ).collect()

        tk_best = qt_best = td_best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter(); tk_rows = _read_tk()
            tk_best = min(tk_best, time.perf_counter() - t0)
            t0 = time.perf_counter(); qt_rows = _read_qt()
            qt_best = min(qt_best, time.perf_counter() - t0)
            t0 = time.perf_counter(); _read_td()
            td_best = min(td_best, time.perf_counter() - t0)
        # stored digest size: bounded at O(compression) per group per
        # part regardless of rows — the claim that distinguishes it
        # from the exact histogram state
        td_centroids = spark.read.parquet(f"{td}/b=*").select(
            F.sum(F.size("means")).alias("c")
        ).collect()[0]["c"]
        td_state_rows = int(td_centroids)
        topk_state.compact(spark, tk, ["g"], counters=256)
        quantile_state.compact(spark, qt, ["g"])
        tdigest_state.compact(spark, td, ["g"])
        t0 = time.perf_counter(); tk_c = _read_tk()
        tk_compact = time.perf_counter() - t0
        t0 = time.perf_counter(); qt_c = _read_qt()
        qt_compact = time.perf_counter() - t0
        t0 = time.perf_counter(); td_c = _read_td()
        td_compact = time.perf_counter() - t0
        # 100-key domain < 256 counters: both exact states are
        # untrimmed-exact here, so folds must preserve reads
        # bit-for-bit (the trimmed regime's fold bound is tested in
        # test_topk_state.py). The digest fold re-compresses — its
        # contract is the rank bound (test_tdigest_state.py), checked
        # here as median within 2% of the exact state's.
        assert [tuple(r) for r in qt_c] == [tuple(r) for r in qt_rows]
        assert [tuple(r) for r in tk_c] == [tuple(r) for r in tk_rows]
        qt_by = {(r["g"], r["prob"]): r["quantile"] for r in qt_c}
        for r in td_c:
            exact = qt_by[(r["g"], r["prob"])]
            assert abs(r["quantile"] - exact) <= 0.02 * 10_000, (r, exact)
        row = {
            "parts": n_parts,
            "topk_read_s": round(tk_best, 2),
            "topk_compacted_s": round(tk_compact, 2),
            "quant_read_s": round(qt_best, 2),
            "quant_compacted_s": round(qt_compact, 2),
            "tdigest_read_s": round(td_best, 2),
            "tdigest_compacted_s": round(td_compact, 2),
            "tdigest_centroids": td_state_rows,
        }
        out.append(row)
        print(json.dumps({"stateparts_probe": row}), flush=True)
        shutil.rmtree(base, ignore_errors=True)
    return out


def _day_events(spark, day: int, n: int, n_users: int, id_offset: int):
    """Generator events confined to simulated day ``day``: timestamps
    remapped onto [day, day+1) deterministically; every other column
    (and the column ORDER the file-stream schema requires) unchanged."""
    from clickhouse_realtime_analytics_demo_spark.sources import generator

    ev = generator.events(spark, n=n, n_users=n_users, id_offset=id_offset, partitions=4)
    base = F.unix_timestamp(F.lit(generator.EPOCH_START).cast("timestamp"))
    sec = F.abs(F.xxhash64("event_id", F.lit(999))) % 86400
    ts = F.timestamp_seconds(base + day * 86400 + sec)
    return ev.withColumn("event_timestamp", ts).withColumn(
        "event_date", F.to_date(F.col("event_timestamp"))
    )


def statedays_probe(
    spark, days=10, events_per_day=5000, n_users=800, max_parts=6
) -> list[dict]:
    """Round-12 (VERDICT r11 #6): multi-day streaming-state growth.
    Drives ONE shared maintenance stream for the three events MVs
    (start_incremental_multi) plus the three State/Merge families
    (topK, exact quantile, t-digest) through ``days`` simulated days
    of ingest; after each day every store runs the part-count
    compaction policy (fold when live parts > max_parts — mv.
    maybe_compact's cadence). Records, per day: state rows/bytes,
    live part counts, fold count, and merge-on-read walls for the
    per-(user,day) grower (mv_user_funnel) and the state families.
    The policy claim: read wall tracks the KEY space (which grows
    ~linearly in days for (user, day) keys), never days × keys —
    asserted structurally in tests/test_streaming.py; the walls here
    are the evidence at probe scale."""
    from clickhouse_realtime_analytics_demo_spark.streaming import (
        mv,
        parts as parts_store,
        quantile_state,
        tdigest_state,
        topk_state,
    )

    base = tempfile.mkdtemp(prefix="statedays_")
    src = f"{base}/src"
    mv_root = f"{base}/mv"
    tk, qt, td = f"{base}/topk", f"{base}/quant", f"{base}/tdig"
    specs = [
        mv.mv_specs()["mv_user_funnel"],
        mv.mv_specs()["mv_hourly_events"],
        mv.mv_specs()["mv_country_stats"],
    ]
    Path(src).mkdir(parents=True)
    queries = [
        mv.start_incremental_multi(
            spark, src, mv_root, specs, f"{base}/ck_mv", max_files_per_trigger=8
        ),
        topk_state.start_incremental(
            spark, src, tk, ["country"], "user_id", f"{base}/ck_tk", counters=1024,
            max_files_per_trigger=8,
        ),
        quantile_state.start_incremental(
            spark, src, qt, ["country"], "duration_seconds", f"{base}/ck_qt",
            max_files_per_trigger=8,
        ),
        tdigest_state.start_incremental(
            spark, src, td, ["country"], "duration_seconds", f"{base}/ck_td",
            max_files_per_trigger=8,
        ),
    ]
    funnel = specs[0]
    funnel_path = f"{mv_root}/{funnel.name}"
    out = []
    folds = 0
    try:
        for day in range(days):
            _day_events(
                spark, day, events_per_day, n_users, id_offset=day * events_per_day
            ).write.mode("append").parquet(src)
            for q in queries:
                q.processAllAvailable()
            # compaction policy tick (the maintenance job's cadence)
            for path, fold in (
                (funnel_path, lambda: mv.compact(spark, funnel_path, funnel)),
                (tk, lambda: topk_state.compact(spark, tk, ["country"], counters=1024)),
                (qt, lambda: quantile_state.compact(spark, qt, ["country"])),
                (td, lambda: tdigest_state.compact(spark, td, ["country"])),
            ):
                if len(parts_store.live_part_dirs(path)) > max_parts:
                    fold()
                    folds += 1

            def _wall(fn) -> float:
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    fn()
                    best = min(best, time.perf_counter() - t0)
                return round(best, 2)

            live = parts_store.live_part_dirs(funnel_path)
            stored_rows = (
                spark.read.parquet(*[str(d) for d in live]).count() if live else 0
            )
            merged_rows = mv.read_final(spark, funnel_path, funnel).count()
            state_bytes = sum(
                f.stat().st_size
                for p in (funnel_path, tk, qt, td)
                for f in Path(p).rglob("*.parquet")
            )
            row = {
                "day": day + 1,
                "events_total": (day + 1) * events_per_day,
                "funnel_parts": len(live),
                "funnel_stored_rows": stored_rows,
                "funnel_keys": merged_rows,
                "state_mb": round(state_bytes / 1048576, 1),
                "folds": folds,
                "funnel_read_s": _wall(
                    lambda: mv.read_final(spark, funnel_path, funnel).count()
                ),
                "topk_read_s": _wall(
                    lambda: topk_state.read_topk(
                        spark, tk, ["country"], k=5, counters=1024
                    ).collect()
                ),
                "quant_read_s": _wall(
                    lambda: quantile_state.read_quantiles(
                        spark, qt, ["country"], [0.5, 0.95]
                    ).collect()
                ),
                "tdigest_read_s": _wall(
                    lambda: tdigest_state.read_quantiles(
                        spark, td, ["country"], [0.5, 0.95]
                    ).collect()
                ),
            }
            out.append(row)
            print(json.dumps({"statedays_probe": row}), flush=True)
    finally:
        for q in queries:
            q.stop()
    shutil.rmtree(base, ignore_errors=True)
    return out


def write_statedays_section(rows: list[dict], max_parts=6) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## Multi-day streaming-state growth (key space vs parts)"
    text, tail_sections = _splice_section(text, marker)
    first, last = rows[0], rows[-1]
    key_growth = round(last["funnel_keys"] / max(first["funnel_keys"], 1), 2)
    read_growth = round(last["funnel_read_s"] / max(first["funnel_read_s"], 1e-9), 2)
    lines = [
        marker.strip(),
        "",
        f"`scale_probe.py statedays` (r12, VERDICT r11 #6): one shared "
        "maintenance stream for the three events MVs "
        "(start_incremental_multi) + the three State/Merge families, "
        f"driven through {len(rows)} simulated days; every store folds "
        f"when its live part count exceeds {max_parts} (the "
        "maybe_compact cadence). mv_user_funnel is the per-(user,day) "
        "key-space grower SURVEY's hard-parts list flags.",
        "",
        "| day | events | funnel parts | stored rows | distinct keys | state MB | folds | funnel read (s) | topK read (s) | quant read (s) | tdigest read (s) |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['day']} | {r['events_total']} | {r['funnel_parts']} |"
            f" {r['funnel_stored_rows']} | {r['funnel_keys']} | {r['state_mb']} |"
            f" {r['folds']} | {r['funnel_read_s']} | {r['topk_read_s']} |"
            f" {r['quant_read_s']} | {r['tdigest_read_s']} |"
        )
    lines += [
        "",
        f"Keys grew {key_growth}× day-1→day-{last['day']}; the funnel "
        f"read wall grew {read_growth}×. With the fold policy the stored "
        "row count re-converges to the key space after every fold "
        "(stored ≈ keys + the un-folded tail), so merge-on-read cost "
        "tracks keys — the linear-in-days term is the KEY SPACE itself, "
        "which is the data model's to own (TTL/retention drops old "
        "days: streaming/retention.py), not a part-accumulation "
        "artifact. Structural form asserted in "
        "tests/test_streaming.py::test_multi_day_state_growth_policy.",
    ]
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def write_stateparts_section(rows: list[dict]) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## Mergeable state: merge-on-read vs part count"
    text, tail_sections = _splice_section(text, marker)
    lines = [
        marker.strip(),
        "",
        "`scale_probe.py stateparts` (r11): read wall for the topK and "
        "quantile State/Merge stores as parts accumulate (500-row parts, "
        "5 groups), then after one compaction fold. Quantile reads are "
        "asserted identical pre/post fold (exact state); the fold is the "
        "AggregatingMergeTree background-merge analog and restores the "
        "read to its single-part cost — same conclusion as the MV partials "
        "probe: compaction cadence, not part count, governs freshness. "
        "r12 adds the bounded t-digest store (quantileTDigest analog): "
        "the centroid column counts TOTAL stored centroids across parts "
        "— O(parts × groups × compression), never row-count-shaped — "
        "and its post-fold read is checked against the exact state's "
        "median within the sketch rank bound.",
        "",
        "| parts | topK read (s) | topK after fold | quantile read (s) | quantile after fold | tdigest read (s) | tdigest after fold | tdigest centroids |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['parts']} | {r['topk_read_s']} | {r['topk_compacted_s']} |"
            f" {r['quant_read_s']} | {r['quant_compacted_s']} |"
            f" {r.get('tdigest_read_s', '-')} | {r.get('tdigest_compacted_s', '-')} |"
            f" {r.get('tdigest_centroids', '-')} |"
        )
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def ivf_recall_probe(
    spark, k=40, nprobes=(1, 2, 4, 8, 16), num_cells=16, n_queries=12
) -> dict:
    """Round-12 (VERDICT r11 #5): recall@10 vs nprobe for the IVF-
    partitioned int8 store at 40× the corpus — the regime where cell
    skew could degrade recall. Replication here PERTURBS: copy i's
    vectors are circularly rotated by i%dim dimensions (norm- and
    distribution-preserving, new points, different cells) — identical
    copies would plant cosine-1.0 duplicates and make recall
    degenerate. Ground truth is the exact FLOAT brute-force top-10, so
    the nprobe=num_cells row isolates pure int8-quantization ranking
    loss and the lower rows add the probe-miss loss on top. Also
    records the cell-size histogram (max/mean skew) — the number that
    decides whether the adaptive-cell story needs a split valve like
    LSH got."""
    from clickhouse_realtime_analytics_demo_spark.operators import similarity as _sim
    from clickhouse_realtime_analytics_demo_spark.sources import quantized as _q

    d = tempfile.mkdtemp(prefix=f"ivfrecall_k{k}_")
    base = table(spark, BASE_SF, "embeddings")
    dim = len(base.select("embedding").first()["embedding"])
    n_base = base.count()
    shift = base.agg(F.max("vec_id")).collect()[0][0] + 1
    parts = []
    for i in range(k):
        sh = i % dim
        vec = (
            F.concat(
                F.slice("embedding", sh + 1, dim - sh), F.slice("embedding", 1, sh)
            )
            if sh
            else F.col("embedding")
        )
        parts.append(
            base.select(
                (F.col("vec_id") + i * shift).cast("long").alias("vec_id"),
                vec.alias("embedding"),
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(16).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    emb = table(spark, d, "embeddings").localCheckpoint()
    n = emb.count()
    _q.ensure_ivf_store(spark, d, num_cells=num_cells, root=d)

    # cell-size skew straight from the store partitions
    store = spark.read.parquet(str(_q.ivf_store_path(d, root=d) / "data"))
    sizes = [r["c"] for r in store.groupBy("cell").agg(F.count("*").alias("c")).collect()]
    skew = round(max(sizes) / (sum(sizes) / len(sizes)), 2)

    qids = [(j * 7919) % n_base + (j % k) * shift for j in range(n_queries)]
    exact: dict[int, set] = {}
    for qid in qids:
        exact[qid] = {
            r["neighbor_id"]
            for r in _sim.brute_force_topk(emb, query_id=qid, k=10).collect()
        }
    recalls = {}
    recalls_rr = {}
    walls = {}
    walls_rr = {}
    rerank = 4096
    for nprobe in nprobes:
        for rr, rec, wall in ((0, recalls, walls), (rerank, recalls_rr, walls_rr)):
            hits = []
            t0 = time.perf_counter()
            for qid in qids:
                got = {
                    r["neighbor_id"]
                    for r in _q.ivf_stored_topk(
                        spark, d, query_id=qid, k=10, nprobe=nprobe,
                        num_cells=num_cells, root=d, rerank=rr,
                    ).collect()
                }
                hits.append(len(got & exact[qid]) / 10.0)
            wall[nprobe] = round((time.perf_counter() - t0) / len(qids), 2)
            rec[nprobe] = round(sum(hits) / len(hits), 3)
    row = {
        "k": k,
        "vectors": n,
        "dim": dim,
        "num_cells": num_cells,
        "queries": n_queries,
        "cell_max_over_mean": skew,
        "cell_min": min(sizes),
        "cell_max": max(sizes),
        "recall_at_10": {str(np_): r for np_, r in recalls.items()},
        "recall_at_10_rerank": {str(np_): r for np_, r in recalls_rr.items()},
        "rerank_candidates": rerank,
        "s_per_query": {str(np_): w for np_, w in walls.items()},
        "s_per_query_rerank": {str(np_): w for np_, w in walls_rr.items()},
    }
    print(json.dumps({"ivf_recall_probe": row}), flush=True)
    shutil.rmtree(d, ignore_errors=True)
    return row


def write_ivf_recall_section(row: dict) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## IVF stored ANN: recall@10 vs nprobe at 40×"
    text, tail_sections = _splice_section(text, marker)
    rec = row["recall_at_10"]
    ceiling = rec.get(str(row["num_cells"]))
    skew = row["cell_max_over_mean"]
    if skew > 4.0:
        verdict = (
            f"Cell skew max/mean = {skew} — a fat cell holds >4× its "
            "share, so low-nprobe recall depends on which cell the query "
            "lands in: the adaptive-cell story NEEDS a split valve (split "
            "cells above a size cap with a local 2-means, the LSH "
            "cap-valve recipe) before the next scale-up."
        )
    else:
        verdict = (
            f"Cell skew max/mean = {skew} (min {row['cell_min']} / max "
            f"{row['cell_max']}) — Lloyd-refined cells stay within a "
            "small factor of balanced at 40×, so no split valve is "
            "needed yet; the LSH-style cap valve remains the documented "
            "escalation if a future corpus concentrates."
        )
    lines = [
        marker.strip(),
        "",
        "`scale_probe.py ivfrecall` (r12, VERDICT r11 #5): recall@10 of "
        "`ivf_stored_topk` vs EXACT float brute force over a 40×-"
        "replicated corpus whose copies are dimension-rotated (new "
        "points, not duplicates), mean over "
        f"{row['queries']} queries spread across copies. The nprobe="
        f"{row['num_cells']} row probes every cell, so its gap from 1.0 "
        "is pure int8-quantization ranking loss; lower rows add "
        "probe-miss loss.",
        "",
        "| nprobe | " + " | ".join(str(np_) for np_ in rec) + " |",
        "|---|" + "---|" * len(rec),
        "| recall@10 (int8) | " + " | ".join(str(v) for v in rec.values()) + " |",
    ]
    rr = row.get("recall_at_10_rerank")
    if rr:
        lines += [
            f"| recall@10 (+float re-rank top {row['rerank_candidates']}) | "
            + " | ".join(str(v) for v in rr.values())
            + " |",
            "| s/query (int8) | "
            + " | ".join(str(v) for v in row["s_per_query"].values())
            + " |",
            "| s/query (+re-rank) | "
            + " | ".join(str(v) for v in row["s_per_query_rerank"].values())
            + " |",
        ]
    lines += [
        "",
        f"({row['vectors']} vectors, dim {row['dim']}, {row['num_cells']} "
        f"cells.) int8 ceiling at nprobe={row['num_cells']}: {ceiling}. "
        + verdict,
    ]
    if rr:
        full = str(row["num_cells"])
        lines += [
            "",
            "r13 (VERDICT r12 #3): the float re-rank over the bounded "
            f"top-{row['rerank_candidates']} int8 candidates lifts the "
            f"full-probe recall {ceiling} → {rr.get(full)} (the residual "
            "was pure int8 RANKING loss, now recovered by exact scoring "
            "of a broadcastable candidate set — a point-lookup join on "
            "the float table, never a second scan). Lower nprobe rows "
            "move little: their loss is PROBE-MISS, not ranking — a "
            "neighbor in an unprobed cell never reaches the candidate "
            "set, so re-rank composes with nprobe rather than "
            "substituting for it. Per-query cost columns above.",
        ]
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def ann_int8_probe(spark, ks=(1, 10, 40)) -> list[dict]:
    """Round-10: float vs int8 brute-force cosine top-k as the
    embedding corpus grows. The int8 scan's claim is memory (4× vs
    float32 at rest), not single-box wall on 64-dim toy vectors — this
    records both walls honestly plus recall@10 of int8 vs float at
    each K (fresh plan per run; best-of-2)."""
    from clickhouse_realtime_analytics_demo_spark.operators import similarity as _sim

    out = []
    for k in ks:
        d = tempfile.mkdtemp(prefix=f"annint8_k{k}_")
        replicate(spark, d, k, only=("embeddings",))
        emb = table(spark, d, "embeddings").localCheckpoint()
        n = emb.count()
        row: dict = {"k": k, "vectors": n}
        for name, fn in (
            ("float_s", lambda: _sim.brute_force_topk(emb, query_id=0, k=10)),
            ("int8_s", lambda: _sim.quantized_topk(emb, query_id=0, k=10)),
        ):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn().collect()
                best = min(best, time.perf_counter() - t0)
            row[name] = round(best, 2)
        exact = [r.neighbor_id for r in _sim.brute_force_topk(emb, query_id=0, k=10).collect()]
        quant = [r.neighbor_id for r in _sim.quantized_topk(emb, query_id=0, k=10).collect()]
        row["recall_at_10"] = round(len(set(exact) & set(quant)) / 10, 2)
        out.append(row)
        print(json.dumps({"ann_int8_probe": row}), flush=True)
        shutil.rmtree(d, ignore_errors=True)
    return out


def write_ann_int8_section(rows: list[dict]) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## int8 vs float brute-force ANN (corpus growth)"
    text, tail_sections = _splice_section(text, marker)
    lines = [
        marker.strip(),
        "",
        "`scale_probe.py annint8` (r10): float vs int8-quantized cosine "
        "top-10 of vec_id=0 on replicated embeddings, best-of-2 fresh "
        "plans, with measured recall@10 of int8 vs the float ranking. "
        "The int8 path's production claim is the 4× at-rest/scan memory "
        "cut (and IVF re-rank cheapness), not single-box wall on 64-dim "
        "toy vectors — both walls recorded honestly.",
        "",
        "| K | vectors | float (s) | int8 (s) | int8 recall@10 |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['k']} | {r['vectors']} | {r['float_s']} | {r['int8_s']} | {r['recall_at_10']} |"
        )
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def ann_stored_probe(spark, ks=(1, 10, 40)) -> list[dict]:
    """Round-11 (VERDICT r10 #3): the write-time-quantized store vs
    the inline-quantize path vs the float baseline as the corpus
    grows. The r10 probe showed inline quantization costs more than
    integer scoring saves; the fix is paying it ONCE at write. Records
    per K: the one-off store build, best-of-2 scan walls for all three
    paths, and at-rest bytes (float parquet vs int8 store)."""
    from clickhouse_realtime_analytics_demo_spark.operators import similarity as _sim
    from clickhouse_realtime_analytics_demo_spark.sources import quantized as _q

    out = []
    for k in ks:
        d = tempfile.mkdtemp(prefix=f"annstored_k{k}_")
        replicate(spark, d, k, only=("embeddings",))
        emb = table(spark, d, "embeddings")
        n = emb.count()
        t0 = time.perf_counter()
        store = _q.ensure_store(spark, d, root=d)
        build_s = round(time.perf_counter() - t0, 2)
        qz = _q.read_store(spark, d, root=d)
        row: dict = {"k": k, "vectors": n, "build_s": build_s}
        t0 = time.perf_counter()
        _q.ensure_ivf_store(spark, d, root=d)
        row["ivf_build_s"] = round(time.perf_counter() - t0, 2)
        for name, fn in (
            ("float_s", lambda: _sim.brute_force_topk(emb, query_id=0, k=10)),
            ("inline_int8_s", lambda: _sim.quantized_topk(emb, query_id=0, k=10)),
            ("stored_int8_s", lambda: _sim.quantized_topk_scan(qz, query_id=0, k=10)),
            # r11: the partition-pruned IVF probe (4/16 of the store's
            # directories opened) — the full storage-as-index stack
            ("ivf_stored_s", lambda: _q.ivf_stored_topk(spark, d, query_id=0, k=10, nprobe=4, root=d)),
        ):
            best = float("inf")
            for _ in range(2):
                t1 = time.perf_counter()
                fn().collect()
                best = min(best, time.perf_counter() - t1)
            row[name] = round(best, 2)
        src = Path(d) / "embeddings.parquet"
        src_bytes = (
            sum(f.stat().st_size for f in src.rglob("*") if f.is_file())
            if src.is_dir()
            else src.stat().st_size
        )
        store_bytes = sum(f.stat().st_size for f in (store / "data").rglob("*.parquet"))
        row["float_kb"] = src_bytes // 1024
        row["store_kb"] = store_bytes // 1024
        row["bytes_ratio"] = round(src_bytes / max(store_bytes, 1), 2)
        out.append(row)
        print(json.dumps({"ann_stored_probe": row}), flush=True)
        shutil.rmtree(d, ignore_errors=True)
    return out


def write_ann_stored_section(rows: list[dict]) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## Write-time int8 store vs inline quantization (scan wall)"
    text, tail_sections = _splice_section(text, marker)
    lines = [
        marker.strip(),
        "",
        "`scale_probe.py annstored` (r11, VERDICT r10 #3): cosine "
        "top-10 scan over (a) float embeddings, (b) inline-quantized "
        "int8 (quantize per query — the r10 registered form), (c) the "
        "write-time int8 store (`sources/quantized.py`; quantize once "
        "at build, scan tinyint). Best-of-2 fresh plans; build is the "
        "one-off cost the store amortizes; bytes ratio is float parquet "
        "/ store parquet — the number that survives to the "
        "memory-bound 100 TB regime.",
        "",
        "| K | vectors | build (s) | float scan (s) | inline int8 (s) | stored int8 (s) | IVF probe (s) | float KB | store KB | bytes ratio |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['k']} | {r['vectors']} | {r['build_s']} | {r['float_s']} |"
            f" {r['inline_int8_s']} | {r['stored_int8_s']} |"
            f" {r.get('ivf_stored_s', '—')} | {r['float_kb']} |"
            f" {r['store_kb']} | {r['bytes_ratio']} |"
        )
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def bpe_encode_probe(spark, n_docs: int = 10_000) -> list[dict]:
    """Round-10: the two BPE ENCODE paths vs merge-table size over the
    synthetic 10⁵-word vocabulary. Fold replay chains one JVM
    projection per merge — cost ∝ merges × corpus REGARDLESS of
    whether a merge fires — while the rank-priority mapInPandas
    encoder pays one dict-driven rewrite loop per word. The table is a
    REAL trained 64-merge prefix (so genuine merging happens) extended
    to larger sizes with well-formed rare-char chain merges (operands
    always exist; they rarely fire in hash-words, which is exactly the
    point — replay pays for them anyway, the rank loop does not)."""
    from clickhouse_realtime_analytics_demo_spark.operators import bpe as _bpe

    docs = _synth_bpe_docs(spark, n_docs)
    words = _bpe.word_counts(docs).select("word").repartition(32).localCheckpoint()
    vocab = words.count()
    trained = _bpe.train_bpe_batched(docs, 64, batch_size=32, exact_counts=False)

    def extend(upto: int) -> list[tuple[int, str, str, str, int]]:
        merges = list(trained)
        rank = max(m[0] for m in merges) + 1
        cur = "q"
        while len(merges) < upto:
            merges.append((rank, cur, "q", cur + "q", 0))
            cur += "q"
            rank += 1
        return merges

    out = []
    for n_merges in (64, 256, 1024, 4096):
        table = extend(n_merges)
        row: dict = {"merges": n_merges, "vocab": vocab}
        t0 = time.perf_counter()
        _bpe.segment_words_rank(words, table).select(F.sum(F.size("bpe"))).collect()
        row["rank_s"] = round(time.perf_counter() - t0, 2)
        if n_merges <= 1024:  # 4096 chained projections: plan depth alone
            t0 = time.perf_counter()  # disqualifies replay — not run
            _bpe.segment_words(words, table).select(F.sum(F.size("bpe"))).collect()
            row["fold_s"] = round(time.perf_counter() - t0, 2)
        out.append(row)
        print(json.dumps({"bpe_encode_probe": row}), flush=True)
    return out


def write_bpe_encode_section(rows: list[dict]) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## BPE encode: fold replay vs rank-priority (merge-table size)"
    text, tail_sections = _splice_section(text, marker)
    lines = [
        marker.strip(),
        "",
        f"`scale_probe.py bpeencode` (r10): both encoders over the synthetic "
        f"{rows[0]['vocab']}-word vocabulary; trained 64-merge prefix extended "
        "with well-formed chain merges (replay pays merges × corpus whether or "
        "not a merge fires; the rank loop pays per pair PRESENT). Single runs.",
        "",
        "| merges | fold replay (s) | rank-priority (s) |",
        "|---|---|---|",
    ]
    for r in rows:
        lines.append(f"| {r['merges']} | {r.get('fold_s', '— (not run: plan depth)')} | {r['rank_s']} |")
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def bpe_batched_probe(spark) -> list[dict]:
    """Round-10 (VERDICT r9 #3): the batched BPE path at PRODUCTION
    merge counts. r9 pinned `train_bpe_batched` but probed it only to
    64 merges; a real tokenizer fits 30k-50k merges, so this probe
    runs ≥1k merges at batch 64-256 over the synthetic 2.5×10⁵-word
    vocabulary and records where the round structure (pair-count
    shuffles), the intra-round fold-chain depth (Catalyst expression/
    codegen growth — the `fold_checkpoint_every` valve), or the
    driver-held merge table becomes the binding cost.

    Configs, one timed run each (minutes-long runs; run-to-run noise
    is small relative to the 4-40× effects measured):
      A/B: 1024 merges, batch 128 vs 256      — batch scaling at depth
      C:   256 merges, batch 128, ckpt 32     — baseline for D and E
      D:   256 merges, batch 128, NO intra-round checkpoint
           — the raw expression-depth cost the valve removes
      E:   C's config at 1/3 the docs         — per-round time vs vocab
      F/G: A/B with exact_counts=False        — the relaxed mode the
           A-run motivated (disjoint picks cap at ~O(|alphabet|)/round,
           so A ran 68 rounds, not 8; relaxed fills every batch)
    """
    import json as _json

    from clickhouse_realtime_analytics_demo_spark.operators import bpe as _bpe

    configs = [
        ("A", 120_000, 1024, 128, 32, True),
        ("B", 120_000, 1024, 256, 32, True),
        ("C", 120_000, 256, 128, 32, True),
        ("D", 120_000, 256, 128, 10**9, True),  # valve off: 128-deep chain/round
        ("E", 40_000, 256, 128, 32, True),
        ("F", 120_000, 1024, 128, 32, False),
        ("G", 120_000, 1024, 256, 32, False),
    ]
    out = []
    for tag, n, merges_n, batch, ckpt, exact in configs:
        docs = _synth_bpe_docs(spark, n)
        vocab = _bpe.word_counts(docs).count()
        st: dict = {}
        t0 = time.perf_counter()
        merges = _bpe.train_bpe_batched(
            docs, merges_n, batch_size=batch, fold_checkpoint_every=ckpt,
            stats=st, exact_counts=exact,
        )
        wall = time.perf_counter() - t0
        table_bytes = sum(
            len(m[1]) + len(m[2]) + len(m[3]) + 16 for m in merges
        )
        row = {
            "cfg": tag,
            "docs": n,
            "vocab": vocab,
            "merges": len(merges),
            "batch": batch,
            "exact": exact,
            "ckpt": ckpt if ckpt < 10**9 else 0,
            "wall_s": round(wall, 1),
            "rounds": st.get("rounds", 0),
            "s_per_round": round(wall / max(st.get("rounds", 1), 1), 2),
            "merges_per_s": round(len(merges) / wall, 1),
            "fold_checkpoints": st.get("fold_checkpoints", 0),
            "merge_table_bytes": table_bytes,
        }
        out.append(row)
        print(_json.dumps({"bpe_batched_probe": row}), flush=True)
        docs.unpersist()
    return out


def semdedup_probe(spark, ks=(1, 10, 40)) -> list[dict]:
    """Round-11: SemDeDup semantic dedup as the corpus grows, with
    num_cells scaled ∝ K (the published doctrine — clusters stay
    bounded, so Σ cluster² stays ~linear in N). Past 64 cells the
    centroid assignment runs through the Arrow/numpy path (the
    plan-literal form folds |C|×dim floats into the Catalyst tree).
    Planted ground truth per K: 5 near-identical copies of the lowest
    ids — recall must stay 5/5 at every scale."""
    from clickhouse_realtime_analytics_demo_spark.operators import similarity as _sim

    out = []
    for k in ks:
        d = tempfile.mkdtemp(prefix=f"semdedup_k{k}_")
        replicate(spark, d, k, only=("embeddings",))
        emb = table(spark, d, "embeddings").localCheckpoint()
        planted = emb.filter(F.col("vec_id") < 5).select(
            (F.col("vec_id") + 100_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                * (
                    F.lit(1.0)
                    + (F.pmod(F.xxhash64(F.col("vec_id"), i, F.lit(99)), F.lit(1000)) - 500)
                    * F.lit(1e-6)
                ),
            )
            .cast("array<float>")
            .alias("embedding"),
            F.col("label"),
        )
        corpus = emb.unionByName(planted).localCheckpoint()
        cells = 16 * k
        t0 = time.perf_counter()
        pairs = _sim.semantic_dedup_pairs(
            corpus, threshold=0.95, num_cells=cells, max_cluster_size=10_000
        ).localCheckpoint()
        n_pairs = pairs.count()
        wall = round(time.perf_counter() - t0, 2)
        # id-shifted replication copies vector VALUES verbatim, so each
        # base vector becomes a K-way exact-duplicate clique — the probe
        # therefore measures dedup under extreme duplication (true-pair
        # volume ∝ K² per clique). Each planted copy must match its
        # original AND all K-1 replicas: expected 5·K planted pairs.
        planted_found = pairs.filter(F.col("id_b") >= 100_000_000).count()
        row = {
            "k": k,
            "vectors": corpus.count(),
            "num_cells": cells,
            "assign": "literal" if cells * 64 <= _sim._LITERAL_ASSIGN_MAX_FLOATS else "arrow",
            "pairs": n_pairs,
            "planted_recall": f"{planted_found}/{5 * k}",
            "wall_s": wall,
        }
        out.append(row)
        print(json.dumps({"semdedup_probe": row}), flush=True)
        shutil.rmtree(d, ignore_errors=True)
    return out


def write_semdedup_section(rows: list[dict]) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## Semantic dedup vs corpus size"
    text, tail_sections = _splice_section(text, marker)
    base = rows[0]
    lines = [
        marker.strip(),
        "",
        "`scale_probe.py semdedup` (r11): SemDeDup-style cluster-confined "
        "embedding dedup with num_cells ∝ K (bounded clusters ⇒ Σ cluster² "
        "~linear in N — the published scale doctrine). Past 64 cells the "
        "nearest-centroid assignment runs as one numpy matmul per Arrow "
        "batch (`assign_cells_arrow`) instead of |C|×dim plan literals. "
        "5 planted near-identical copies per K are the recall gate.",
        "",
        "| K | vectors | cells | assignment | pairs | planted recall | wall (s) | ratio |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['k']} | {r['vectors']} | {r['num_cells']} | {r['assign']} |"
            f" {r['pairs']} | {r['planted_recall']} | {r['wall_s']} |"
            f" {round(r['wall_s'] / base['wall_s'], 1)}x |"
        )
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def bpe_4096_probe(spark) -> dict:
    """Round-11 (VERDICT r10 #4): relaxed BPE at 4096 merges — 4× past
    the r10 1024-merge point, en route to the 32k production count —
    with the per-phase wall split (recount vs fold) that decides
    whether incremental pair-count maintenance (update only pairs
    touching this round's merged symbols) would pay. rounds ==
    merges/batch exactly in relaxed mode, so 4096 @ batch 256 = 16
    recounts; the question is whether the recount (corpus-sized
    explode+groupBy per round) or the fold chain (one rewrite per
    merge, checkpointed every 32) binds."""
    import json as _json

    from clickhouse_realtime_analytics_demo_spark.operators import bpe as _bpe

    docs = _synth_bpe_docs(spark, 120_000)
    vocab = _bpe.word_counts(docs).count()
    st: dict = {}
    t0 = time.perf_counter()
    merges = _bpe.train_bpe_batched(
        docs, 4096, batch_size=256, fold_checkpoint_every=32, stats=st,
        exact_counts=False,
    )
    wall = time.perf_counter() - t0
    row = {
        "docs": 120_000,
        "vocab": vocab,
        "merges": len(merges),
        "batch": 256,
        "wall_s": round(wall, 1),
        "rounds": st.get("rounds", 0),
        "s_per_round": round(wall / max(st.get("rounds", 1), 1), 2),
        "recount_s": round(st.get("recount_s", 0.0), 1),
        "fold_s": round(st.get("fold_s", 0.0), 1),
        "recount_share_pct": round(
            100.0 * st.get("recount_s", 0.0) / max(wall, 1e-9), 1
        ),
        "fold_checkpoints": st.get("fold_checkpoints", 0),
    }
    print(_json.dumps({"bpe_4096_probe": row}), flush=True)
    return row


def bpe_big_probe(spark, merge_counts=(8192, 16384), prefix_pin=512) -> list[dict]:
    """Round-12 (VERDICT r11 #4): relaxed BPE at PRODUCTION merge
    counts, end-to-end — no extrapolation. Per rung: full
    train_bpe_batched(exact_counts=False) run with the recount/fold
    wall split, plus a sampled-prefix VOCABULARY PIN: the first
    ``prefix_pin`` merges re-derived single-threaded by the
    pure-Python twin (tests.test_bpe.reference_train_bpe_batched, the
    same selection rule) from the same word counts — the distributed
    trainer's merge sequence must match symbol-for-symbol."""
    import json as _json

    from clickhouse_realtime_analytics_demo_spark.operators import bpe as _bpe
    from tests.test_bpe import reference_train_bpe_batched

    docs = _synth_bpe_docs(spark, 120_000)
    wc_df = _bpe.word_counts(docs).localCheckpoint()
    vocab = wc_df.count()
    wc = {r["word"]: r["cnt"] for r in wc_df.collect()}
    ref = reference_train_bpe_batched(
        wc, prefix_pin, batch_size=256, exact_counts=False
    )
    ref_prefix = [(m[1], m[2], m[3]) for m in ref]
    out = []
    for num_merges in merge_counts:
        st: dict = {}
        t0 = time.perf_counter()
        merges = _bpe.train_bpe_batched(
            docs, num_merges, batch_size=256, fold_checkpoint_every=32,
            stats=st, exact_counts=False,
        )
        wall = time.perf_counter() - t0
        got_prefix = [(m[1], m[2], m[3]) for m in merges[:prefix_pin]]
        row = {
            "docs": 120_000,
            "vocab": vocab,
            "merges": len(merges),
            "batch": 256,
            "wall_s": round(wall, 1),
            "rounds": st.get("rounds", 0),
            "s_per_round": round(wall / max(st.get("rounds", 1), 1), 2),
            "recount_s": round(st.get("recount_s", 0.0), 1),
            "fold_s": round(st.get("fold_s", 0.0), 1),
            "recount_share_pct": round(
                100.0 * st.get("recount_s", 0.0) / max(wall, 1e-9), 1
            ),
            "prefix_pin": prefix_pin,
            "prefix_ok": got_prefix == ref_prefix,
        }
        assert row["prefix_ok"], (
            f"prefix vocabulary diverged from the pure-Python twin at "
            f"{next(i for i, (a, b) in enumerate(zip(got_prefix, ref_prefix)) if a != b)}"
        )
        out.append(row)
        print(_json.dumps({"bpe_big_probe": row}), flush=True)
    return out


def write_bpe_big_section(rows: list[dict], anchor_4096_s: float = 1715.0) -> None:
    """SCALEPROBE section with the MEASURED scaling exponent: least-
    squares slope of log(wall) vs log(merges) over this run's rungs
    plus the committed r11 4096-merge anchor."""
    import math as _math

    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## Relaxed BPE at production merge counts (measured)"
    text, tail_sections = _splice_section(text, marker)
    pts = [(4096.0, anchor_4096_s)] + [(float(r["merges"]), r["wall_s"]) for r in rows]
    xs = [_math.log(p[0]) for p in pts]
    ys = [_math.log(p[1]) for p in pts]
    n = len(pts)
    mx, my = sum(xs) / n, sum(ys) / n
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    top = max(pts, key=lambda p: p[0])
    wall_32k_h = top[1] * (32768.0 / top[0]) ** slope / 3600.0
    lines = [
        marker.strip(),
        "",
        "`scale_probe.py bpebig` (r12, VERDICT r11 #4): "
        "`train_bpe_batched(exact_counts=False)` run END-TO-END at "
        "production merge counts (batch 256, fold checkpoints every 32) "
        "over the 120k-doc hash-word corpus — the r11 4096-merge row "
        "extrapolated 32k; these rungs measure it. Each rung also pins "
        f"the first {rows[0]['prefix_pin']} merges symbol-for-symbol "
        "against the pure-Python twin re-derived from the same word "
        "counts (prefix_ok, asserted in the probe).",
        "",
        "| merges | rounds | wall (s) | s/round | recount (s) | fold (s) | recount share | prefix pin |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['merges']} | {r['rounds']} | {r['wall_s']} | {r['s_per_round']} |"
            f" {r['recount_s']} | {r['fold_s']} | {r['recount_share_pct']}% |"
            f" {'OK' if r['prefix_ok'] else 'DIVERGED'} |"
        )
    lines += [
        "",
        f"Measured scaling exponent over {{{', '.join(str(int(p[0])) for p in pts)}}} "
        f"merges: wall ∝ merges^{slope:.2f} (least squares on log-log; the "
        "4096 point is the committed r11 anchor). The fold chain (one "
        "corpus rewrite per merge) stays the binding cost at every rung; "
        "recount share stays low, re-confirming that incremental "
        f"pair-count maintenance cannot pay. At this exponent a 32k-merge "
        f"tokenizer lands at ~{wall_32k_h:.1f} h on this box — a scheduled "
        "training job, not a query; on a real cluster the fold is "
        "map-side parallel and scales with executors.",
    ]
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def write_bpe_4096_section(row: dict) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## Relaxed BPE at 4096 merges (recount vs incremental)"
    text, tail_sections = _splice_section(text, marker)
    recount_pct = row["recount_share_pct"]
    fold_pct = round(100.0 * row["fold_s"] / max(row["wall_s"], 1e-9), 1)
    if recount_pct >= 60:
        decision = (
            "Decision: the RECOUNT dominates — incremental pair-count "
            "maintenance (recompute only over words containing this "
            f"round's merged symbols) would attack the {recount_pct}% "
            "and is the next lever for 32k merges."
        )
    else:
        decision = (
            f"Decision: the recount is NOT the binding cost ({recount_pct}% "
            f"of wall vs {fold_pct}% in the fold/checkpoint chain), so "
            "incremental pair-count maintenance — which only removes "
            "recount work and adds a distributed delta-merge per round — "
            "cannot pay at this shape. The fold chain already carries the "
            "depth valve (`fold_checkpoint_every`); the remaining fold "
            "cost is the corpus rewrite itself, which every BPE trainer "
            "pays once per merge. Extrapolation to 32k @ batch 256 = 128 "
            "rounds: wall scales ~linearly in merges (fold-bound), i.e. "
            "~8× this run — feasible, no algorithm change required."
        )
    lines = [
        marker.strip(),
        "",
        "`scale_probe.py bpe4096` (r11, VERDICT r10 #4): "
        "`train_bpe_batched(exact_counts=False)` at 4096 merges, batch "
        "256, over the synthetic hash-word corpus, with the per-phase "
        "wall split that the recount-vs-incremental decision needs "
        "(recount = per-round corpus pair explode + groupBy + ranked "
        "pool collect; fold = per-merge corpus rewrite + checkpoint "
        "barriers every 32).",
        "",
        "| docs | vocab | merges | batch | rounds | wall (s) | s/round | recount (s) | fold (s) | recount share |",
        "|---|---|---|---|---|---|---|---|---|---|",
        f"| {row['docs']} | {row['vocab']} | {row['merges']} | {row['batch']} |"
        f" {row['rounds']} | {row['wall_s']} | {row['s_per_round']} |"
        f" {row['recount_s']} | {row['fold_s']} | {recount_pct}% |",
        "",
        decision,
    ]
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def write_bpe_batched_section(rows: list[dict]) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## Batched BPE at production merge counts"
    text, tail_sections = _splice_section(text, marker)
    lines = [
        marker.strip(),
        "",
        "`scale_probe.py bpebatched` (r10, VERDICT r9 #3): "
        "`train_bpe_batched` at ≥1k merges over the synthetic "
        "hash-word vocabulary. ckpt = `fold_checkpoint_every` "
        "(0 = intra-round checkpointing off). One timed run per "
        "config (minutes-long runs).",
        "",
        "| cfg | docs | vocab | merges | batch | exact | ckpt | wall (s) | rounds | s/round | merges/s | merge table (bytes) |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['cfg']} | {r['docs']} | {r['vocab']} | {r['merges']} |"
            f" {r['batch']} | {'y' if r.get('exact', True) else 'n'} |"
            f" {r['ckpt']} | {r['wall_s']} | {r['rounds']} |"
            f" {r['s_per_round']} | {r['merges_per_s']} | {r['merge_table_bytes']} |"
        )
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def write_corpusprep_section(rows: list[dict]) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## Corpus-prep pipelines vs corpus size"
    text, tail_sections = _splice_section(text, marker)
    base = rows[0]
    lines = [
        marker.strip(),
        "",
        "`scale_probe.py corpusprep`: both registered corpus-prep"
        " compositions run end-to-end on cipher-replicated documents"
        " (disjoint content per copy ⇒ true pairs grow ~linearly, but"
        " the shared (source,lang) BLOCKS grow linearly with K — the"
        " exact form's Σ block² hazard on real corpora). Best-of-2"
        " warm. Exact capped at K=4 by design: the quadratic arm is"
        " the thing being demonstrated, the LSH arm the thing being"
        " shipped (bench HEADLINE).",
        "",
        "| K | docs | exact pipeline (s) | ratio | LSH pipeline (s) | ratio |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        ex = r.get("exact_s")
        ls = r.get("lsh_s")
        exr = f"{round(ex / base['exact_s'], 1)}x" if ex and base.get("exact_s") else "—"
        lsr = f"{round(ls / base['lsh_s'], 1)}x" if ls and base.get("lsh_s") else "—"
        lines.append(
            f"| {r['k']} | {r['k'] * 4792} | {ex if ex is not None else '—'} |"
            f" {exr} | {ls if ls is not None else '—'} | {lsr} |"
        )
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def write_funnel_section(rows: list[dict], retain_days: int = 30) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## Funnel MV state vs key cardinality"
    text, tail_sections = _splice_section(text, marker)
    lines = [
        marker.strip(),
        "",
        "`scale_probe.py funnelstate`: mv_user_funnel (per-(user,day)"
        " keys — SURVEY §7's flagged state-growth hard part) grown with"
        " real sink writes at 1×/10×/100× user cardinality, 40+3 ×"
        " 1000-row micro-batches over the generator's 90-day event"
        " window. No streaming state store exists to size (partials"
        " append per batch; the MV table IS the state), so the columns"
        " are the replacing quantities: append latency (flat ⇒ ingest"
        " never pays for cardinality), state rows vs distinct keys"
        " (state tracks KEYS TOUCHED, saturating at users × 90 days,"
        " not input rows), and the TTL fold"
        f" (`compact(retain_where=event_date ≥ max-{retain_days}d)`,"
        " the ClickHouse `TTL … DELETE` analog) that codifies the"
        f" steady-state bound: rows = {retain_days} × |daily active"
        " keys|.",
        "",
        "| users | keyspace | input rows | state rows | state keys |"
        " append (ms) | read_final (ms) | compact (s) | rows folded |"
        " TTL fold (s) | rows retained |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['users']} | {r['keyspace']} | {r['input_rows']} |"
            f" {r['state_rows']} | {r['state_keys']} | {r['append_ms']} |"
            f" {r['read_final_ms']} | {r['compact_s']} | {r['rows_folded']} |"
            f" {r['ttl_fold_s']} | {r['rows_retained']} |"
        )
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def write_mv_section(rows: list[dict]) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## MV maintenance vs part count"
    text, tail_sections = _splice_section(text, marker)
    lines = [
        marker.strip(),
        "",
        "`scale_probe.py mv`: daily_user_activity grown with real sink"
        " writes (200-row partial batches, one coalesced part each — at"
        " reference rate ≈ one part per 2 s), best-of-3 warm timings."
        " Append cost is FLAT (the sink never lists existing parts);"
        " `read_final` grows with part count (listing + per-file open);"
        " `compact()` restores the read floor. Cadence policy derived"
        " from these numbers: see `mv.compact`'s docstring.",
        "",
        "| parts | append (ms) | read_final (ms) | compact (s) | read after compact (ms) |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['parts']} | {r['append_ms']} | {r['read_final_ms']} |"
            f" {r['compact_s']} | {r['read_after_compact_ms']} |"
        )
    md.write_text(
        text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections
    )


def router_probe(spark, k: int = 50) -> list[dict]:
    """Prove (or disprove) that the projection router pays at K≥50
    (VERDICT r5 next-round #5; reference claims "granules scanned
    reduced by 90%+", 03-add-projections.sql / ARCHITECTURE.md:262).

    Builds a generator events table at K× the sf0.1 row count
    (100k × K = 5M rows at K=50, full lake schema) in the BASE layout
    (sorted by the primary key ``event_type, event_date, user_id,
    ts``) plus two router copies — by ``(user_id, event_timestamp)``
    and by ``(session_id,)`` — then measures point-lookup queries
    through the base vs the routed copy with the query-log's scan
    metrics (read_rows / read_files / read_bytes, Spark's own
    SQLMetrics) and best-of-3 wall time. A query matching the BASE
    sort prefix is probed too: the router must route it to base (no
    copy scores) and cost nothing.
    """
    import tempfile as _tf

    from clickhouse_realtime_analytics_demo_spark.ops.query_log import scan_metrics
    from clickhouse_realtime_analytics_demo_spark.plans.router import ProjectionRouter
    from clickhouse_realtime_analytics_demo_spark.sources import generator, writer

    root = _tf.mkdtemp(prefix="routerprobe_")
    total = 100_000 * k
    n_users = 1000 * k
    grown = generator.events(spark, n=total, n_users=n_users, seed=11, partitions=32)

    writer.write_table(grown, root, "events", files_per_month=8)
    router = ProjectionRouter()
    router.add_copy(spark, "events", grown, ("user_id", "event_timestamp"), root, files=32)
    router.add_copy(spark, "events", grown, ("session_id",), root, files=32)
    base = writer.read_table(spark, root, "events")

    probe_user = n_users // 2  # an arbitrary mid-range user
    probe_sess = base.filter(F.col("user_id") == probe_user).select(
        "session_id"
    ).first()["session_id"]

    cases = {
        "point_user": (
            frozenset({"user_id"}),
            lambda df: df.filter(F.col("user_id") == probe_user).agg(
                F.count("*"), F.sum("duration_seconds")
            ),
        ),
        "point_session": (
            frozenset({"session_id"}),
            lambda df: df.filter(F.col("session_id") == probe_sess).agg(
                F.count("*"), F.sum("revenue")
            ),
        ),
        # matches the BASE sort prefix: router must fall back to base
        "type_day_match_base": (
            frozenset({"event_type", "event_date"}),
            lambda df: df.filter(
                (F.col("event_type") == "purchase")
                & (F.col("event_date") == "2024-02-01")
            ).agg(F.count("*"), F.sum("revenue")),
        ),
    }

    out = []
    for name, (filter_cols, q) in cases.items():
        routed_src = router.resolve(spark, "events", base, filter_cols)
        routed_to = router.decisions[-1][2]
        row = {"case": name, "routed_to": routed_to, "total_rows": total}
        for label, source in (("base", base), ("routed", routed_src)):
            best = float("inf")
            metrics = None
            for _ in range(3):
                df = q(source)
                t0 = time.perf_counter()
                df.collect()
                best = min(best, time.perf_counter() - t0)
                metrics = scan_metrics(df)
            row[label] = {
                "s": round(best, 3),
                **{m: int(v) for m, v in metrics.items()},
            }
        out.append(row)
        print(json.dumps(row), flush=True)
    shutil.rmtree(root, ignore_errors=True)
    return out


def write_router_section(rows: list[dict], k: int) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## Projection router payoff"
    text, tail_sections = _splice_section(text, marker)
    lines = [
        marker.strip(),
        "",
        f"`scale_probe.py router` at K={k} (events sf0.1 ×{k} ="
        f" {rows[0]['total_rows']:,} rows): point lookups measured through"
        " the base layout (sorted by the primary key) vs the copy the"
        " router picks, with Spark's own scan SQLMetrics — the"
        " `read_rows`/`read_files` columns of the reference's"
        " system.query_log. `type_day_match_base` matches the BASE sort"
        " prefix, so the router must (and does) route it to base —"
        " identical cost by construction.",
        "",
        "| case | routed to | base s / rows / files | routed s / rows / files | rows skipped |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        b, rt = r["base"], r["routed"]
        skip = 1 - (rt["read_rows"] / b["read_rows"]) if b["read_rows"] else 0.0
        lines.append(
            f"| {r['case']} | {r['routed_to']} |"
            f" {b['s']} / {b['read_rows']:,} / {b['read_files']} |"
            f" {rt['s']} / {rt['read_rows']:,} / {rt['read_files']} |"
            f" {round(100 * skip, 1)}% |"
        )
    lines += [
        "",
        "Reading: parquet row-group stats DO suffice — when the sort"
        " matches the predicate (`type_day_match_base` skips 99.2% on"
        " the base layout alone). The router exists for access paths"
        " the base sort cannot serve: a scattered-key point lookup"
        " reads the whole table through base (min/max on every granule"
        " spans the key) and 0.4% of it through the routed copy. Local"
        " wall-clock gains are modest because 5M rows sit in page"
        " cache; the `read_rows`/`read_bytes` ratio is the number that"
        " scales — at 100 TB the base-path scan is the cluster-melting"
        " one. Matches the reference's 90%+ granule-skip claim on"
        " user/session paths; storage cost is K× copies, the same"
        " trade the reference makes.",
    ]
    md.write_text(
        text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections
    )


def _plan_has_skew_split(df) -> bool:
    """True if the executed adaptive plan marks any join as skew-split
    (AQE's OptimizeSkewedJoin stamps ``isSkew=true`` on SMJ/SHJ)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "isSkew=true" in plan or "skew=true" in plan


def skew_probe(spark) -> list[dict]:
    """Skewed-data probe (VERDICT r5 next-round #7): the uniform
    replication probe preserves uniformity; real corpora are Zipfian.
    Plants pathological hot keys and records whether AQE's skew-join
    split and the operators' own safety valves handle them.

    Cases:
    - ``copurchased_hot_basket``: sf0.1 lineitem + ONE planted order
      with 10^4 distinct parts. The self-join's hot key alone expands
      to C(10^4,2) ≈ 5·10^7 pairs inside a single shuffle partition —
      the canonical one-straggler-task shape. Measured with AQE
      skew-join off vs on, plus the executed plan's isSkew marker.
      (NB the 50M-pair expansion is CORRECT output for this input —
      the probe measures whether it parallelizes, not whether it
      disappears.)
    - ``minhash_hot_bucket``: documents + N docs with IDENTICAL text —
      one LSH mega-bucket in every band. B docs in a bucket are B²/2
      candidate pairs, so no join strategy saves a true mega-bucket;
      the 100 TB safety valve is the opt-in bucket cap
      (operators/dedup.py:minhash_lsh_candidates max_bucket_size).
      Measured: no-cap at N=2000 (the quadratic cost, 2·10^6 pairs)
      vs cap=512 at N=10^4 (mega-bucket dropped; a no-cap run there
      would be 25× the 2000-doc quadratic arm).
    - ``salted_fact_dim``: orders + one customer owning 10^5 orders,
      joined to a customer dim with broadcast disabled (the big-dim
      regime where skew matters). Plain SMJ vs AQE skew split vs
      operators/skew.salted_join — is explicit salting still needed
      when AQE exists?
    """
    import tempfile as _tf

    from clickhouse_realtime_analytics_demo_spark.operators import dedup, skew

    out = []
    root = _tf.mkdtemp(prefix="skewprobe_")

    # ---- case A: copurchased hot basket --------------------------------
    li = table(spark, BASE_SF, "lineitem")
    max_order = li.agg(F.max("l_orderkey")).collect()[0][0]
    hot = (
        spark.range(1, 10_001)
        .select(
            F.lit(max_order + 1).alias("l_orderkey"),
            (F.col("id") + 1_000_000).alias("l_partkey"),
        )
    )
    aug = li.select("l_orderkey", "l_partkey").unionByName(hot)
    aug.write.mode("overwrite").parquet(f"{root}/lineitem.parquet")
    q = all_queries()["copurchased_parts"].fn  # only reads lineitem
    # AQE's skew decision is size-based (default threshold 256 MB);
    # the planted hot partitions here are MBs, so thresholds are
    # scaled DOWN to put them in the same regime a TB-scale partition
    # occupies at defaults — the knob being probed is the mechanism,
    # not the absolute byte count.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
    for bcast, aqe_skew in (
        ("default", "false"),
        ("default", "true"),
        ("off", "false"),  # forced SMJ — the 100 TB self-join regime
        ("off", "true"),
    ):
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold",
            "-1" if bcast == "off" else str(64 * 1024 * 1024),
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe_skew)
        best = float("inf")
        marker = False
        mix = ""
        for _ in range(2):
            df = q(spark, root)
            t0 = time.perf_counter()
            df.collect()
            best = min(best, time.perf_counter() - t0)
            marker = marker or _plan_has_skew_split(df)
            mix = _join_mix(df)
        row = {
            "case": "copurchased_hot_basket",
            "arm": f"bcast={bcast},aqe_skew={aqe_skew}",
            "s": round(best, 2),
            "plan_skew_split": marker,
            "joins": mix,
        }
        out.append(row)
        print(json.dumps(row), flush=True)
    # mitigation arm: cap basket size BEFORE the self-join (the
    # generic dedup-bucket-cap valve, operators/skew.cap_group_size) —
    # still in the forced-SMJ regime, quadratic hot key removed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def capped_q():  # fresh plan per run — no cross-run shuffle reuse
        li_capped = skew.cap_group_size(
            spark.read.parquet(f"{root}/lineitem.parquet"), ["l_orderkey"], 256
        )
        a, b = li_capped.alias("a"), li_capped.alias("b")
        return (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
            .agg(F.count("*").alias("together"))
            .filter(F.col("together") >= 2)
            .orderBy(F.desc("together"), "pa", "pb")
            .limit(50)
        )

    best = float("inf")
    marker = False
    mix = ""
    for _ in range(2):
        df = capped_q()
        t0 = time.perf_counter()
        df.collect()
        best = min(best, time.perf_counter() - t0)
        marker = marker or _plan_has_skew_split(df)
        mix = _join_mix(df)
    row = {
        "case": "copurchased_hot_basket",
        "arm": "bcast=off,basket_cap=256",
        "s": round(best, 2),
        "plan_skew_split": marker,
        "joins": mix,
    }
    out.append(row)
    print(json.dumps(row), flush=True)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

    # ---- case B: minhash mega-bucket -----------------------------------
    docs = table(spark, BASE_SF, "documents").select("doc_id", "text")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0]
    boiler = "the quick brown fox jumps over the lazy dog " * 8
    for label, n_hot, cap in (("nocap_n2000", 2000, None), ("cap512_n10000", 10_000, 512)):
        hot_docs = spark.range(1, n_hot + 1).select(
            (F.col("id") + max_doc).alias("doc_id"), F.lit(boiler).alias("text")
        )
        planted = docs.unionByName(hot_docs)
        t0 = time.perf_counter()
        n_pairs = dedup.minhash_lsh_candidates(
            planted, max_bucket_size=cap
        ).count()
        row = {
            "case": "minhash_hot_bucket",
            "arm": label,
            "s": round(time.perf_counter() - t0, 2),
            "candidate_pairs": n_pairs,
        }
        out.append(row)
        print(json.dumps(row), flush=True)

    # ---- case C: hot-FK fact⋈dim, big-dim regime -----------------------
    orders = table(spark, BASE_SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    cust = table(spark, BASE_SF, "customer").select("c_custkey", "c_mktsegment")
    hot_cust = cust.limit(1).collect()[0]["c_custkey"]
    max_ok = orders.agg(F.max("o_orderkey")).collect()[0][0]
    hot_orders = spark.range(1, 100_001).select(
        (F.col("id") + max_ok).alias("o_orderkey"),
        F.lit(hot_cust).alias("o_custkey"),
        (F.col("id") % 1000 + 1.0).alias("o_totalprice"),
    )
    fact = orders.unionByName(hot_orders)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        arms = {
            "plain_smj_no_aqe_skew": ("false", lambda: fact.join(cust, fact.o_custkey == cust.c_custkey)),
            "aqe_skew_split": ("true", lambda: fact.join(cust, fact.o_custkey == cust.c_custkey)),
            "salted_join": ("false", lambda: skew.salted_join(
                fact, cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
            )),
        }
        for label, (aqe_skew, build) in arms.items():
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe_skew)
            best = float("inf")
            marker = False
            mix = ""
            for _ in range(2):
                df = build().groupBy("c_mktsegment").agg(
                    F.sum("o_totalprice").alias("rev")
                )
                t0 = time.perf_counter()
                df.collect()
                best = min(best, time.perf_counter() - t0)
                marker = marker or _plan_has_skew_split(df)
                mix = _join_mix(df)
            row = {
                "case": "salted_fact_dim",
                "arm": label,
                "s": round(best, 2),
                "plan_skew_split": marker,
                "joins": mix,
            }
            out.append(row)
            print(json.dumps(row), flush=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256m"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    shutil.rmtree(root, ignore_errors=True)
    return out


def write_skew_section(rows: list[dict]) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## Skewed-key probe"
    text, tail_sections = _splice_section(text, marker)
    lines = [
        marker.strip(),
        "",
        "`scale_probe.py skew`: planted Zipfian pathologies (the"
        " uniform replication probe can't produce them) — a 10^4-line"
        " order in the basket self-join, an identical-text LSH"
        " mega-bucket, a customer owning 10^5 orders in the"
        " broadcast-disabled big-dim regime. AQE skew thresholds are"
        " scaled down so the planted MB-scale partitions sit in the"
        " regime a TB-scale partition occupies at defaults.",
        "",
        "**Findings.** (1) The hot basket's skew lives in the join's"
        " OUTPUT (10^4 rows in → 5·10^7 pairs out); AQE's skew split"
        " keys on shuffle-INPUT bytes, where the hot partition looks"
        " uniform (~160 KB) — `isSkew` never fires, at any threshold."
        " No runtime re-planner can see output expansion coming."
        " (2) Broadcast joins spread same-key expansion across input"
        " splits naturally (BHJ arms ~5-8 s vs SMJ's one-straggler"
        " 30-39 s) — a reason beyond bytes to keep the self-join's"
        " small side broadcastable. (3) The scale-safe valve for"
        " quadratic-output hot keys is bounding the group before the"
        " join: `operators/skew.cap_group_size` (the generic form of"
        " the LSH bucket cap) takes the forced-SMJ arm from 30 s to"
        " 0.87 s; the LSH cap arm likewise drops a 10^4-doc"
        " mega-bucket that would cost 25× the measured 2000-doc"
        " quadratic arm. (4) The 10^5-order hot FK is absorbed by"
        " ordinary SMJ at this scale and AQE's split stands by for"
        " bigger ones; explicit salting costs more than it saves here"
        " — it remains the tool for non-adaptive engines/streaming,"
        " not a default.",
        "",
        "| case | arm | wall (s) | detail |",
        "|---|---|---|---|",
    ]
    for r in rows:
        if "plan_skew_split" in r:
            detail = f"skew-split={r['plan_skew_split']}, {r.get('joins', '')}"
        else:
            detail = f"pairs={r.get('candidate_pairs'):,}"
        lines.append(f"| {r['case']} | {r.get('arm')} | {r['s']} | {detail} |")
    md.write_text(
        text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections
    )


def cc_probe(spark, sizes=(120_000, 1_200_000, 4_800_000)) -> list[dict]:
    """Connected components (operators/graph.py) vs edge volume.

    Planted graphs with KNOWN component structure, generated entirely
    executor-side (spark.range + expressions): `clusters` arms are
    size-6 near-dup-like groups (chain-linked — the minimum edge set
    that still forces transitive resolution); `+chain` arms add one
    4096-node path, the diameter worst case that defeats label
    propagation (4095 rounds) but costs star contraction only ~log
    rounds. Every arm's output is ASSERTED against the known component
    count and node total, so this is a correctness-at-scale gate too,
    not just a timer.
    """
    from clickhouse_realtime_analytics_demo_spark.operators.graph import (
        connected_components,
    )

    cluster_size, chain_len = 6, 4096
    rows: list[dict] = []
    for n in sizes:
        intra = (
            spark.range(n)
            .filter((F.col("id") % cluster_size) != cluster_size - 1)
            .filter(F.col("id") + 1 < n)
            .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        )
        chain = (
            spark.range(n, n + chain_len - 1)
            .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        )
        for arm, edges, want_comps, want_nodes in (
            ("clusters", intra, n // cluster_size, n),
            (
                "clusters+chain4096",
                intra.union(chain),
                n // cluster_size + 1,
                n + chain_len,
            ),
        ):
            edges = edges.localCheckpoint(eager=True)  # time CC, not range codegen
            n_edges = edges.count()
            best, stats = float("inf"), {}
            for _ in range(2):
                t0 = time.perf_counter()
                got = connected_components(edges, stats=stats)
                comps, nodes = got.agg(
                    F.countDistinct("component"), F.count("*")
                ).collect()[0]
                best = min(best, time.perf_counter() - t0)
            assert comps == want_comps, (arm, n, comps, want_comps)
            assert nodes == want_nodes, (arm, n, nodes, want_nodes)
            rows.append(
                {
                    "arm": arm,
                    "edges": n_edges,
                    "rounds": stats["rounds"],
                    "s": round(best, 3),
                    "components": comps,
                }
            )
            print(json.dumps(rows[-1]), flush=True)
    return rows


def write_cc_section(rows: list[dict]) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## Connected components"
    text, tail_sections = _splice_section(text, marker)
    base = {r["arm"]: r["s"] for r in rows if r["edges"] <= rows[0]["edges"] * 1.5}
    lines = [
        marker.strip(),
        "",
        "`scale_probe.py cc`: star-contraction connected components"
        " (the cluster-resolution step behind keep-one-per-cluster"
        " dedup) on planted graphs with known structure — size-6"
        " chained clusters, plus an arm with a 4096-node path (the"
        " diameter worst case: label propagation would need 4095"
        " rounds; star contraction stays logarithmic). Output is"
        " asserted against the known component count at every size,"
        " so these timings are also a correctness-at-scale gate."
        " Best-of-2; rounds = large+small star iterations including"
        " the final no-change confirmation.",
        "",
        "| arm | edges | rounds | wall (s) | ratio |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        ratio = round(r["s"] / base[r["arm"]], 1) if base.get(r["arm"]) else "-"
        lines.append(
            f"| {r['arm']} | {r['edges']:,} | {r['rounds']} | {r['s']} | {ratio}x |"
        )
    md.write_text(
        text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections
    )


def dedup_ingest_probe(
    spark, corpus_sizes=(10_000, 100_000, 500_000), batch_rows=500
) -> list[dict]:
    """Per-batch cost of dedup-at-ingest vs accepted-corpus size.

    Seeds an accepted store with N unique fingerprints (pre-computed,
    written directly as one part), then times ``dedup_batch`` for a
    ``batch_rows``-row delivery that is half duplicates / half fresh —
    on BOTH reference-scan paths (IN-pushdown vs full anti-join).
    The design claim under test: per-batch cost is one fingerprint-
    column scan of the corpus (columnar, no shuffle of the corpus)
    plus work proportional to the batch — NOT a corpus-sized shuffle.
    Random md5 fingerprints defeat min/max row-group pruning by
    construction, so the pushdown's win is shuffle avoidance, not
    fewer rows read; the numbers say whether that's enough.
    """
    import tempfile as _tmp

    from pyspark.sql import functions as PF

    from clickhouse_realtime_analytics_demo_spark.streaming import dedup as sdedup

    rows: list[dict] = []
    for n in corpus_sizes:
        d = _tmp.mkdtemp(prefix=f"dedup_ingest_{n}_")
        out = f"{d}/out"
        # Seed: N unique docs written as the b=0 part (fingerprinted
        # the same way dedup_batch would).
        seed = spark.range(n).select(
            PF.col("id").alias("doc_id"),
            PF.concat(PF.lit("seed text "), PF.col("id")).alias("text"),
        )
        sdedup.dedup_batch(spark, seed, out, batch_id=0)
        # Delivery: half dups of seed rows, half fresh.
        half = batch_rows // 2
        dups = spark.range(half).select(
            (PF.col("id") + 10_000_000).alias("doc_id"),
            PF.concat(PF.lit("seed text "), PF.col("id") * (n // half)).alias("text"),
        )
        fresh = spark.range(half).select(
            (PF.col("id") + 20_000_000).alias("doc_id"),
            PF.concat(PF.lit("fresh text "), PF.col("id")).alias("text"),
        )
        batch = dups.union(fresh).localCheckpoint(eager=True)
        for arm, cap in (("pushdown", sdedup.MAX_PUSHDOWN_FINGERPRINTS), ("anti_join", 0)):
            best = float("inf")
            for rep in range(1, 4):
                t0 = time.perf_counter()
                sdedup.dedup_batch(
                    spark, batch, out, batch_id=rep if arm == "pushdown" else 100 + rep,
                    max_pushdown_fingerprints=cap,
                )
                best = min(best, time.perf_counter() - t0)
                # remove the written part so the next rep sees the same corpus
                shutil.rmtree(f"{out}/b={rep if arm == 'pushdown' else 100 + rep}")
            accepted = spark.read.parquet(f"{out}/b=0")
            rows.append(
                {"corpus": n, "arm": arm, "batch_rows": batch_rows, "s": round(best, 3)}
            )
            print(json.dumps(rows[-1]), flush=True)
            assert accepted.count() == n  # corpus untouched
        shutil.rmtree(d, ignore_errors=True)
    return rows


def _neardup_text(prefix, idc):
    """Distinct multi-token texts: 48 tokens drawn from disjoint id
    ranges so no two seed docs share a 3-shingle. 48 tokens matters:
    a 1-token edit then leaves Jaccard ≈ 45/47 ≈ 0.96, whose 8-band
    LSH miss probability is ~4e-7 — the probes' zero-miss asserts are
    sound. (At 12 tokens J ≈ 0.82 and ~1% of edits would be missed
    legitimately: LSH recall, not a bug.)"""
    from pyspark.sql import functions as PF

    return PF.concat_ws(
        " ",
        *[PF.concat(PF.lit(f"{prefix}w{i}x"), (idc * 48 + i).cast("string")) for i in range(48)],
    )


def neardup_ingest_probe(
    spark, corpus_sizes=(10_000, 50_000, 200_000), batch_rows=500
) -> list[dict]:
    """Per-batch cost of NEAR-DUP dedup-at-ingest vs accepted-corpus
    size. Seeds N distinct accepted docs (band index included), then
    times ``neardup_batch`` for a 500-row delivery that is half
    1-word-edit near-dups of accepted docs, half fresh — asserting the
    expected accept/reject split, so the timing is also a correctness
    check. The scan-side term is the (id, bands) index read + the
    band-bucket join; the in-batch MinHash+CC term is fixed per batch.
    """
    import tempfile as _tmp

    from pyspark.sql import functions as PF

    from clickhouse_realtime_analytics_demo_spark.streaming import dedup as sdedup

    _text = _neardup_text
    rows: list[dict] = []
    for n in corpus_sizes:
        d = _tmp.mkdtemp(prefix=f"neardup_ingest_{n}_")
        out = f"{d}/out"
        # Seed in ≤50k-row batches then compact — the store shape
        # production produces (micro-batch parts folded into a merged
        # part written with full parallelism). One giant coalesce(1)
        # seed batch would leave a single-file store whose every
        # reference scan is a one-task read — a probe artifact, not a
        # steady state (first run measured exactly that: 10.8 s/batch
        # at 200k vs 2.9 s at 50k, all of it single-task decode).
        chunk = 50_000
        t0 = time.perf_counter()
        for ci, lo in enumerate(range(0, n, chunk)):
            seed = spark.range(lo, min(lo + chunk, n)).select(
                PF.col("id").alias("doc_id"), _text("s", PF.col("id")).alias("text")
            )
            sdedup.neardup_batch(spark, seed, out, batch_id=ci)
        sdedup.compact_accepted(spark, out)
        seed_s = time.perf_counter() - t0
        half = batch_rows // 2
        # near-dups: re-generate an accepted doc's text, swap ONE token
        dups = spark.range(half).select(
            (PF.col("id") + 10_000_000).alias("doc_id"),
            PF.regexp_replace(
                _text("s", PF.col("id") * (n // half)), r"^\S+", "edited"
            ).alias("text"),
        )
        fresh = spark.range(half).select(
            (PF.col("id") + 20_000_000).alias("doc_id"),
            _text("f", PF.col("id")).alias("text"),
        )
        batch = dups.union(fresh).localCheckpoint(eager=True)
        best = float("inf")
        for rep in range(1, 4):
            t0 = time.perf_counter()
            sdedup.neardup_batch(spark, batch, out, batch_id=rep)
            el = time.perf_counter() - t0
            surv = spark.read.parquet(f"{out}/b={rep}")
            n_dup_admitted = surv.filter(
                (PF.col("doc_id") >= 10_000_000) & (PF.col("doc_id") < 20_000_000)
            ).count()
            n_fresh = surv.filter(PF.col("doc_id") >= 20_000_000).count()
            assert n_fresh == half, n_fresh
            assert n_dup_admitted == 0, n_dup_admitted  # every edit caught
            best = min(best, el)
            shutil.rmtree(f"{out}/b={rep}")
        rows.append(
            {
                "corpus": n,
                "batch_rows": batch_rows,
                "s": round(best, 3),
                "seed_s": round(seed_s, 1),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
        shutil.rmtree(d, ignore_errors=True)
    return rows


def neardup_parts_probe(
    spark, corpus=100_000, parts_counts=(8, 64, 256, 512), batch_rows=500
) -> list[dict]:
    """Per-batch near-dup ingest cost vs LIVE PART COUNT of the
    accepted store, at a fixed corpus size — locates the compaction
    threshold for ``maybe_compact_accepted`` (VERDICT r6 #5). The
    store content is identical across rows; only its fragmentation
    varies, so the delta is purely the listing/open/footers overhead
    the per-batch reference scans pay. Seeding writes precomputed
    (doc, bands) slices directly (the store layout), so 512-part
    seeding doesn't pay 512 MinHash pipelines."""
    import tempfile as _tmp

    from pyspark.sql import functions as PF

    from clickhouse_realtime_analytics_demo_spark.operators import dedup as ddup
    from clickhouse_realtime_analytics_demo_spark.streaming import dedup as sdedup

    docs = spark.range(corpus).select(
        PF.col("id").alias("doc_id"), _neardup_text("s", PF.col("id")).alias("text")
    )
    sigs = ddup.minhash_signatures(docs, "text", "doc_id", 32, 3)
    bands = sigs.select(
        PF.col("id").alias("doc_id"), ddup.band_array_expr(32, 8).alias("bands")
    )
    store_df = docs.join(bands, "doc_id").localCheckpoint(eager=True)

    half = batch_rows // 2
    dups = spark.range(half).select(
        (PF.col("id") + 10_000_000).alias("doc_id"),
        PF.regexp_replace(
            _neardup_text("s", PF.col("id") * (corpus // half)), r"^\S+", "edited"
        ).alias("text"),
    )
    fresh = spark.range(half).select(
        (PF.col("id") + 20_000_000).alias("doc_id"),
        _neardup_text("f", PF.col("id")).alias("text"),
    )
    batch = dups.union(fresh).localCheckpoint(eager=True)

    rows: list[dict] = []
    for np_ in parts_counts:
        d = _tmp.mkdtemp(prefix=f"neardup_parts_{np_}_")
        out = f"{d}/out"
        per = (corpus + np_ - 1) // np_
        for i in range(np_):
            (
                store_df.filter(
                    (PF.col("doc_id") >= i * per) & (PF.col("doc_id") < (i + 1) * per)
                )
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(f"{out}/b={i}")
            )
        best = float("inf")
        for rep in range(1, 4):
            bid = np_ + rep  # past the seed part ids
            t0 = time.perf_counter()
            sdedup.neardup_batch(spark, batch, out, batch_id=bid)
            el = time.perf_counter() - t0
            surv = spark.read.parquet(f"{out}/b={bid}")
            assert surv.filter(PF.col("doc_id") >= 20_000_000).count() == half
            assert (
                surv.filter(
                    (PF.col("doc_id") >= 10_000_000) & (PF.col("doc_id") < 20_000_000)
                ).count()
                == 0
            )
            best = min(best, el)
            shutil.rmtree(f"{out}/b={bid}")
        rows.append({"parts": np_, "s": round(best, 3)})
        print(json.dumps(rows[-1]), flush=True)
        shutil.rmtree(d, ignore_errors=True)
    return rows


def write_neardup_parts_section(rows: list[dict], corpus: int) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## Near-dup ingest vs part count"
    text, tail_sections = _splice_section(text, marker)
    lines = [
        marker.strip(),
        "",
        f"`scale_probe.py neardupparts`: per-batch `neardup_batch` cost"
        f" against a {corpus:,}-doc accepted store fragmented into N"
        " live parts (same content, only fragmentation varies) —"
        " best-of-3, same accept/reject asserts as the corpus-size"
        " probe. This measures exactly what compaction buys the"
        " per-batch reference scans, and fixes the"
        " `maybe_compact_accepted` threshold.",
        "",
        "| live parts | per-batch (s) |",
        "|---|---|",
    ]
    for r in rows:
        lines.append(f"| {r['parts']} | {r['s']} |")
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def write_neardup_ingest_section(rows: list[dict]) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## Near-dup ingest vs corpus size"
    text, tail_sections = _splice_section(text, marker)
    lines = [
        marker.strip(),
        "",
        "`scale_probe.py neardupingest`: per-batch cost of"
        " `neardup_batch` (in-batch MinHash keep-one + band-index join"
        " + Jaccard verify) as the accepted corpus grows. 500-row"
        " batches, half 1-token edits of accepted docs / half fresh;"
        " the probe ASSERTS all edits are rejected and all fresh"
        " admitted each round, so timings double as a recall check."
        " Best-of-3. seed_s = one-shot cost of accepting the corpus"
        " itself (the in-batch pipeline at that size).",
        "",
        "| accepted corpus | per-batch (s) | seed batch (s) |",
        "|---|---|---|",
    ]
    for r in rows:
        lines.append(f"| {r['corpus']:,} | {r['s']} | {r['seed_s']} |")
    md.write_text(
        text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections
    )


def write_dedup_ingest_section(rows: list[dict]) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## Dedup-at-ingest vs corpus size"
    text, tail_sections = _splice_section(text, marker)
    lines = [
        marker.strip(),
        "",
        "`scale_probe.py dedupingest`: per-batch cost of the streaming"
        " dedup reference scan as the accepted corpus grows (500-row"
        " batch, half duplicates). Best-of-3. Random md5 fingerprints"
        " defeat min/max row-group pruning by construction, so both"
        " arms scan the corpus' fingerprint column; the pushdown arm"
        " avoids shuffling it (filter + broadcast anti), the anti_join"
        " arm shuffles corpus + batch (SMJ). The honest reading and"
        " the 100 TB design note follow the table.",
        "",
        "| accepted corpus | arm | per-batch (s) |",
        "|---|---|---|",
    ]
    for r in rows:
        lines.append(f"| {r['corpus']:,} | {r['arm']} | {r['s']} |")
    md.write_text(
        text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections
    )


def temporal_probe(spark, ks=(1, 4, 10)) -> list[dict]:
    """Round-8 temporal/order-statistic ops vs data size: the as-of
    join (union + user-partitioned window carry — ~linear), the
    windowFunnel (range-frame window + one stage-stitch equi-join —
    ~linear), and exact per-segment quantiles (group-partitioned sort
    — ~n log n within fixed group count). events/orders/customer grow
    K x; cross-copy as-of matches thin out by design (user ids and
    custkeys shift by different strides), which does not change the
    dominant cost — every key timeline is still sorted once."""
    registry = all_queries()
    out = []
    for k in ks:
        d = tempfile.mkdtemp(prefix=f"temporal_k{k}_")
        replicate(spark, d, k, only=("events", "orders", "customer"))
        row: dict = {"k": k}
        for name, key in (
            ("events_asof_order", "asof_s"),
            ("window_funnel", "funnel_s"),
            ("order_value_quantiles", "quantiles_s"),
        ):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                registry[name].fn(spark, d).collect()
                best = min(best, time.perf_counter() - t0)
            row[key] = round(best, 2)
            row[key + "_joins"] = _join_mix(registry[name].fn(spark, d))
        out.append(row)
        print(json.dumps({"temporal_probe": row}), flush=True)
        shutil.rmtree(d, ignore_errors=True)
    return out


def asof_hotkey_probe(spark, sizes=(1_000_000, 4_000_000, 8_000_000)) -> list[dict]:
    """Round-9 as-of hot-key ceiling (VERDICT r8 #6): plant ALL rows on
    ONE key (the per-key window's serialization floor), compare
    against a uniform 10k-key spread, then apply the split_bucket_us
    valve to the hot timeline. Fresh plan per timed run — re-collecting
    one adaptively-executed DataFrame reuses its materialized shuffle
    stages and measures only the final stage (hit while building this
    probe: 8M rows "in 0.03 s")."""
    from clickhouse_realtime_analytics_demo_spark.operators.temporal import asof_join

    def build(n_left, n_users, split=None):
        left = spark.range(1, n_left + 1, numPartitions=32).select(
            F.col("id").alias("event_id"),
            (F.xxhash64("id", F.lit(1)) % n_users).alias("k")
            if n_users > 1 else F.lit(1).alias("k"),
            F.timestamp_micros(
                (F.col("id") * 1000 + F.xxhash64("id") % 997).cast("long")
            ).alias("t"),
        )
        right = spark.range(1, 10_001, numPartitions=8).select(
            F.col("id").alias("rid"),
            (F.xxhash64("id", F.lit(2)) % n_users).alias("k")
            if n_users > 1 else F.lit(1).alias("k"),
            F.timestamp_micros((F.col("id") * 250_000).cast("long")).alias("rt"),
            (F.col("id") % 100).alias("payload"),
        )
        out = asof_join(
            left, right, left_on="k", right_on="k", left_time="t",
            right_time="rt", right_tie="rid", payload_cols=("payload",),
            split_bucket_us=split,
        )
        # aggregate the CARRIED column: a bare count() prunes the window
        return out.agg(F.sum("asof_payload").alias("s"), F.count("*").alias("n"))

    build(100_000, 100).collect()  # JVM warm
    rows = []
    for n in sizes:
        row: dict = {"rows": n}
        # bucket the hot timeline into ~64 tasks' worth of work
        split = max(1, (n * 1000) // 64)
        for label, users, sp in (
            ("hot_s", 1, None),
            ("uniform_s", 10_000, None),
            ("hot_split_s", 1, split),
        ):
            best = float("inf")
            for _ in range(2):
                q = build(n, users, sp)
                t0 = time.perf_counter()
                q.collect()
                best = min(best, time.perf_counter() - t0)
            row[label] = round(best, 2)
        rows.append(row)
        print(json.dumps({"asof_hotkey_probe": row}), flush=True)
    return rows


def write_asof_hotkey_section(rows: list[dict]) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## As-of hot key"
    text, tail_sections = _splice_section(text, marker)
    lines = [
        marker.strip(),
        "",
        "`scale_probe.py asofhotkey`: ALL events on ONE key vs a uniform"
        " 10k-key spread, then the same hot timeline with the r9"
        " `split_bucket_us` valve (time buckets sized to ~64 tasks;"
        " results bit-identical across every direction/strict/tolerance"
        " combination, tests/test_asof.py). Fresh plan per run,"
        " best-of-2. The unvalved hot key is the per-key window's"
        " serialization floor; the valve turns it back into parallel"
        " work at the cost of one spine window + join.",
        "",
        "| rows (one key) | hot (s) | uniform 10k keys (s) | hot/uniform | hot + split valve (s) |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['rows']} | {r['hot_s']} | {r['uniform_s']} |"
            f" {round(r['hot_s'] / r['uniform_s'], 1)}x | {r['hot_split_s']} |"
        )
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def write_temporal_section(rows: list[dict]) -> None:
    base = {r["k"]: r for r in rows}[rows[0]["k"]]
    lines = [
        "## Round-8 temporal ops vs data size",
        "",
        "`scale_probe.py temporal`: as-of join (union + user-partitioned window"
        " carry), windowFunnel (range-frame window + one stage-stitch equi-join)"
        " and exact per-segment quantiles (group-partitioned sort) on"
        " K x-replicated events/orders/customer, best-of-3 warm. Near-linear"
        " ratios = no super-linear term (range-explosion join, unpartitioned"
        " window, per-anchor rescan) hiding at bench scale.",
        "",
        "| K | rows (events) | asof (s) | ratio | funnel (s) | ratio | exact quantiles (s) | ratio |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        k = r["k"]
        lines.append(
            f"| {k} | {100_000 * k} | {r['asof_s']} |"
            f" {round(r['asof_s'] / base['asof_s'], 1)}x | {r['funnel_s']} |"
            f" {round(r['funnel_s'] / base['funnel_s'], 1)}x | {r['quantiles_s']} |"
            f" {round(r['quantiles_s'] / base['quantiles_s'], 1)}x |"
        )
    lines.append("")
    lines.append(
        "Join strategies at max K: asof="
        + rows[-1]["asof_s_joins"]
        + "; funnel="
        + rows[-1]["funnel_s_joins"]
        + "; quantiles="
        + rows[-1]["quantiles_s_joins"]
        + "."
    )
    text = Path("SCALEPROBE.md").read_text()
    head, tail = _splice_section(text, "## Round-8 temporal ops vs data size")
    Path("SCALEPROBE.md").write_text(head + "\n".join(lines) + "\n" + tail)


def state_retention_probe(
    spark, days=10, retain_days=3, events_per_day=20_000, n_users=1500,
    grace_seconds=4.0,
) -> list[dict]:
    """Round-13 (VERDICT r12 #2, the at-scale half): multi-day ingest
    into DATE-KEYED state for all four State/Merge families with a
    sliding ``retain_days`` retention horizon applied at every
    compaction fold (the Compactor-with-retention cadence; ClickHouse
    "TTL applies on merges"). The r12 growth probe proved part count
    is policy-bounded but the key space grew linearly — this records
    the closed loop: per day, stored rows == the RETAINED window's key
    space exactly (asserted), state bytes and merge-on-read walls FLAT
    once the window saturates (day ≥ retain_days) while total ingest
    keeps growing 10×."""
    base = tempfile.mkdtemp(prefix="stateretention_")
    # the probe compresses a "day" to ~10-15 s of wall clock, so the
    # production 120 s tombstone grace would span the whole run and
    # folded parts would never reap — scale grace with the compressed
    # clock (same ratio: grace ≪ day) so steady-state BYTES are
    # measurable, not just steady-state rows. Restored on exit.
    from clickhouse_realtime_analytics_demo_spark.streaming import (
        parts as _parts_mod,
    )

    prod_grace = _parts_mod.GRACE_SECONDS
    _parts_mod.GRACE_SECONDS = grace_seconds
    # r13 ADVICE: restore the module global and remove the temp dir in
    # a finally — an exception mid-probe (e.g. a failed stored-rows
    # assert) must not leave the compressed grace active process-wide
    try:
        return _state_retention_probe_body(
            spark, base, days, events_per_day, n_users, retain_days
        )
    finally:
        _parts_mod.GRACE_SECONDS = prod_grace
        shutil.rmtree(base, ignore_errors=True)


def _state_retention_probe_body(
    spark, base: str, days: int, events_per_day: int, n_users: int, retain_days: int
):
    from pyspark.sql import functions as F  # noqa: F811

    from clickhouse_realtime_analytics_demo_spark.streaming import (
        mv,
        parts as parts_store,
        quantile_state,
        tdigest_state,
        topk_state,
    )

    mv_root = f"{base}/mv"
    tk, qt, td = f"{base}/topk", f"{base}/quant", f"{base}/tdig"
    keys = ["event_date", "country"]
    spec = mv.mv_specs()["mv_country_stats"]  # (country, event_date, event_type)
    mv_path = f"{mv_root}/{spec.name}"
    out = []
    batches = []
    dates = []
    for day in range(days):
        b = _day_events(
            spark, day, events_per_day, n_users, id_offset=day * events_per_day
        ).localCheckpoint()
        batches.append(b)
        dates.append(b.select(F.min("event_date")).collect()[0][0])
        mv.write_batch(b, spec, mv_path, batch_id=day)
        topk_state.write_batch(b, keys, "user_id", tk, batch_id=day, counters=1024)
        quantile_state.write_batch(
            b, keys, F.col("duration_seconds"), qt, batch_id=day
        )
        tdigest_state.write_batch(b, keys, F.col("duration_seconds"), td, batch_id=day)
        cutoff = dates[max(0, day - retain_days + 1)]
        pred = F.col("event_date") >= F.lit(cutoff)
        mv.compact(spark, mv_path, spec, retain_where=pred)
        topk_state.compact(spark, tk, keys, counters=1024, retain_where=pred)
        quantile_state.compact(spark, qt, keys, retain_where=pred)
        tdigest_state.compact(spark, td, keys, retain_where=pred)

        retained = batches[max(0, day - retain_days + 1) :]
        ru = retained[0]
        for p in retained[1:]:
            ru = ru.unionByName(p)
        mv_keys = ru.select(*spec.keys).distinct().count()
        state_keys = ru.select(*keys).distinct().count()
        mv_stored = spark.read.parquet(
            str(parts_store.live_part_dirs(mv_path)[0])
        ).count()
        tk_stored = spark.read.parquet(
            str(parts_store.live_part_dirs(tk)[0])
        ).count()
        assert mv_stored == mv_keys, (day, mv_stored, mv_keys)
        assert tk_stored == state_keys, (day, tk_stored, state_keys)

        def _wall(fn) -> float:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            return round(best, 2)

        state_bytes = sum(
            f.stat().st_size
            for p in (mv_path, tk, qt, td)
            for f in Path(p).rglob("*.parquet")
        )
        row = {
            "day": day + 1,
            "events_total": (day + 1) * events_per_day,
            "retained_days": min(day + 1, retain_days),
            "mv_stored_rows": mv_stored,
            "state_keys": state_keys,
            "state_mb": round(state_bytes / 1048576, 2),
            "mv_read_s": _wall(lambda: mv.read_final(spark, mv_path, spec).count()),
            "topk_read_s": _wall(
                lambda: topk_state.read_topk(spark, tk, keys, k=5, counters=1024).collect()
            ),
            "quant_read_s": _wall(
                lambda: quantile_state.read_quantiles(spark, qt, keys, [0.5, 0.95]).collect()
            ),
            "tdigest_read_s": _wall(
                lambda: tdigest_state.read_quantiles(spark, td, keys, [0.5, 0.95]).collect()
            ),
        }
        out.append(row)
        print(json.dumps({"state_retention_probe": row}), flush=True)
    for b in batches:
        b.unpersist()
    return out


def write_state_retention_section(rows: list[dict], retain_days: int = 3) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## State retention: the sliding-horizon fold closes the key-space term"
    text, tail_sections = _splice_section(text, marker)
    sat = [r for r in rows if r["day"] >= retain_days]
    lines = [
        marker.strip(),
        "",
        "`scale_probe.py stateretention` (r13, VERDICT r12 #2): "
        f"{rows[-1]['day']} simulated days into DATE-KEYED state for all "
        "four State/Merge families, each day's compaction folding with a "
        f"sliding {retain_days}-day retention predicate "
        "(compact(retain_where=…) — the TTL-on-merge analog the r12 probe "
        "named as the one unbounded term). Stored rows are ASSERTED equal "
        "to the retained window's key space at every fold (the probe "
        "aborts otherwise). The tombstone grace window is scaled to the "
        "probe's compressed day (~12 s wall per day vs the production "
        "120 s grace), keeping grace ≪ day at the same ratio as "
        "production — the first run left grace unscaled and measured "
        "pure tombstone accumulation (+0.36 MB/day, rows still flat), "
        "which at real cadence the existing reap-on-fold already sheds.",
        "",
        "| day | events total | MV stored rows | state keys | state MB |"
        " MV read (s) | topK read (s) | quant read (s) | tdigest read (s) |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['day']} | {r['events_total']} | {r['mv_stored_rows']} |"
            f" {r['state_keys']} | {r['state_mb']} | {r['mv_read_s']} |"
            f" {r['topk_read_s']} | {r['quant_read_s']} | {r['tdigest_read_s']} |"
        )
    first_sat, last = sat[0], rows[-1]
    lines += [
        "",
        f"Steady state from day {retain_days}: stored rows "
        f"{first_sat['mv_stored_rows']} → {last['mv_stored_rows']} and "
        f"state {first_sat['state_mb']} → {last['state_mb']} MB while total "
        f"ingest grew {rows[-1]['day']}× — size is bounded by retention × "
        "daily key space, not by ingest history; read walls stay in one "
        "band across the run. With retention wired into all four stores "
        "the multi-year 100 TB deployment has no unbounded state term "
        "left: raw lake bounded by TTL partition drops "
        "(streaming/retention.py), derived state bounded by the same "
        "horizon at fold time.",
    ]
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def bench_sf1_probe(spark, k: int = 10, runs: int = 2) -> dict:
    """Round-13 (VERDICT r12 #4): the sf1 bench rung. Every committed
    band is sf0.1 (~600K-row facts) — the same order as the reference
    demo — while the repo's claims are 100×-scale plans. This runs the
    full bench HEADLINE at sf1 (10× FK-consistent replication of
    sf0.1, cipher-grown documents so near-dup output stays linear) and
    records per-query sf0.1→sf1 scaling factors: best-of-``runs`` at
    sf1 over a SAME-SESSION single sf0.1 pass (same JVM, same plans)
    plus the committed clean band as a second anchor. Queries above
    10× get named for a plan explanation or a fix; ~linear factors are
    the measured form of "the plan survives a scale-up".

    Artifacts: a SCALEPROBE section + BENCH_BANDS_sf1.json (per-query
    sf1 mins — the rung future rounds compare against)."""
    import bench as _bench

    d = tempfile.mkdtemp(prefix="benchsf1_")
    t0 = time.perf_counter()
    replicate(spark, d, k)
    build_s = round(time.perf_counter() - t0, 1)
    qs = all_queries()
    bands = _bench._load_bands()
    # same-session sf0.1 anchor (one pass; the committed band is the
    # low-noise anchor, this one controls for session/JVM state)
    base_wall: dict[str, float] = {}
    for name in _bench.HEADLINE:
        t0 = time.perf_counter()
        qs[name].fn(spark, BASE_SF).collect()
        base_wall[name] = round(time.perf_counter() - t0, 3)
    sf1_wall: dict[str, float] = {}
    for name in _bench.HEADLINE:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            qs[name].fn(spark, d).collect()
            best = min(best, time.perf_counter() - t0)
        sf1_wall[name] = round(best, 3)
        print(
            json.dumps(
                {
                    "bench_sf1": {
                        "query": name,
                        "sf1_s": sf1_wall[name],
                        "sf01_session_s": base_wall[name],
                        "band_s": bands.get(name),
                    }
                }
            ),
            flush=True,
        )
    row = {
        "k": k,
        "runs": runs,
        "replicate_build_s": build_s,
        "sf1": sf1_wall,
        "sf01_session": base_wall,
        "total_sf1_s": round(sum(sf1_wall.values()), 1),
        "total_sf01_session_s": round(sum(base_wall.values()), 1),
    }
    # min-merge with any committed sf1 bands (VERDICT r13 #3: a
    # single-run rung over-reads ×band for queries that drew host
    # noise — ≥2 clean runs merged compares like with like)
    merged = dict(sf1_wall)
    prior_file = Path("BENCH_BANDS_sf1.json")
    if prior_file.exists():
        prior = json.loads(prior_file.read_text()).get("queries", {})
        for name, v in prior.items():
            merged[name] = min(v, merged[name]) if name in merged else v
    prior_file.write_text(
        json.dumps({"queries": dict(sorted(merged.items()))}, indent=1) + "\n"
    )
    shutil.rmtree(d, ignore_errors=True)
    return row


def write_bench_sf1_section(row: dict) -> None:
    import bench as _bench

    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## sf1 bench rung: the full HEADLINE at 10× (measured)"
    text, tail_sections = _splice_section(text, marker)
    bands = _bench._load_bands()
    lines = [
        marker.strip(),
        "",
        "`scale_probe.py benchsf1` (r13, VERDICT r12 #4): every HEADLINE "
        "query best-of-%d at sf1 (10× FK-consistent replication, "
        "cipher-grown docs) vs a same-session sf0.1 pass and the "
        "committed sf0.1 clean band. Factor = sf1 / same-session sf0.1 "
        "(same JVM, same plans — isolates DATA scaling from session "
        "noise). Per-query sf1 mins are committed as BENCH_BANDS_sf1."
        % row["runs"],
        "",
        "| query | sf0.1 (session) | sf0.1 (band) | sf1 | ×session | ×band |",
        "|---|---|---|---|---|---|",
    ]
    super_linear = []
    for name in _bench.HEADLINE:
        s01 = row["sf01_session"][name]
        s1 = row["sf1"][name]
        band = bands.get(name)
        f_sess = round(s1 / s01, 1) if s01 > 0 else float("inf")
        f_band = round(s1 / band, 1) if band else None
        # name super-linear queries by the CLEAN band anchor (the
        # session pass is single-run and carries first-run store
        # builds, skewing its factor low for exactly the heavy queries)
        if (f_band or f_sess) > 10:
            super_linear.append((name, f_band or f_sess))
        lines.append(
            f"| {name} | {s01} | {band if band is not None else '—'} | {s1} |"
            f" {f_sess}× | {f_band if f_band is not None else '—'}× |"
        )
    lines += [
        "",
        f"Totals: sf0.1 session {row['total_sf01_session_s']} s → sf1 "
        f"{row['total_sf1_s']} s "
        f"({round(row['total_sf1_s'] / row['total_sf01_session_s'], 1)}× "
        f"for 10× data); lake replication itself took "
        f"{row['replicate_build_s']} s.",
    ]
    if super_linear:
        lines += [
            "",
            "Queries above 10× their clean sf0.1 band (named per the "
            "rung's contract): "
            + ", ".join(f"{n} ({f}×)" for n, f in super_linear)
            + ".",
        ]
    else:
        lines += [
            "",
            "No query exceeded 10× its clean sf0.1 band for 10× data — "
            "every HEADLINE plan scales at-or-below linear at this rung.",
        ]
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


STEEPEST = ("events_asof_order", "nation_revenue", "doc_bigram_novelty")
# tables each steepest query touches (replicate only those)
_STEEP_TABLES = (
    "events", "orders", "customer", "lineitem", "supplier", "part", "documents",
)


def _plan_volumes(df) -> dict:
    """Post-execution cost-term split from the executed plan's SQL
    metrics: bytes leaving scans vs bytes crossing shuffles (plus
    shuffle records). This is the measured form of "is the growth
    term scan volume or shuffle volume" (VERDICT r13 #4)."""
    from tests.test_plan_snapshots import _walk

    scan_bytes = shuffle_bytes = shuffle_rows = 0
    for node in _walk(df._jdf.queryExecution().executedPlan()):
        cls = node.getClass().getSimpleName()
        try:
            mets = node.metrics()
        except Exception:  # noqa: BLE001 — nodes without metrics
            continue
        it = mets.iterator()
        while it.hasNext():
            kv = it.next()
            key, metric = kv._1(), kv._2()
            if cls.startswith("FileSourceScan") and key == "filesSize":
                scan_bytes += metric.value()
            elif cls.startswith("ShuffleExchange"):
                if key == "shuffleBytesWritten":
                    shuffle_bytes += metric.value()
                elif key == "shuffleRecordsWritten":
                    shuffle_rows += metric.value()
    return {
        "scan_mb": round(scan_bytes / 1048576, 1),
        "shuffle_mb": round(shuffle_bytes / 1048576, 1),
        "shuffle_rows": int(shuffle_rows),
    }


def steepest_rung_probe(spark, ks=(10, 30), runs: int = 2) -> list[dict]:
    """Round-14 (VERDICT r13 #4): one rung past sf1 for the three
    steepest session-factor queries from the sf1 rung
    (events_asof_order 3.6×, nation_revenue 3.3×, doc_bigram_novelty
    3.3× at 10×). Runs JUST those at k=10 (sf1, the anchor) and k=30
    (sf3) in one session and records wall factors plus the measured
    cost-term split (scan MB vs shuffle MB/rows from the executed
    plan's SQL metrics) — confirming the growth is the linear data
    term, not a quadratic-with-small-constant join/window."""
    qs = all_queries()
    out = []
    for k in ks:
        d = tempfile.mkdtemp(prefix=f"steep{k}_")
        t0 = time.perf_counter()
        replicate(spark, d, k, only=_STEEP_TABLES)
        build_s = round(time.perf_counter() - t0, 1)
        for name in STEEPEST:
            best, vols = float("inf"), None
            for _ in range(runs):
                t0 = time.perf_counter()
                df = qs[name].fn(spark, d)
                df.collect()
                dt = time.perf_counter() - t0
                if dt < best:
                    best, vols = dt, _plan_volumes(df)
            row = {"query": name, "k": k, "wall_s": round(best, 3), **vols,
                   "replicate_build_s": build_s}
            out.append(row)
            print(json.dumps({"steepest_rung": row}), flush=True)
        shutil.rmtree(d, ignore_errors=True)
    return out


# the named dominant cost term per steepest query (verified against
# the measured scan/shuffle split; see SCALEPROBE section)
_STEEP_TERMS = {
    "events_asof_order": (
        "one keyed shuffle of events+orders on user_id (as-of merge) — "
        "shuffle rows ∝ fact rows, no range explosion"
    ),
    "nation_revenue": (
        "lineitem scan + partial agg; dims broadcast — scan volume "
        "dominates, shuffle bounded by group keys"
    ),
    "doc_bigram_novelty": (
        "bigram-token shuffle for the novelty groupBy — shuffle rows "
        "∝ total bigrams (linear in corpus)"
    ),
}


def write_steepest_rung_section(rows: list[dict]) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## sf3 rung: the three steepest sf1 queries, one rung further"
    text, tail_sections = _splice_section(text, marker)
    by_q: dict[str, dict[int, dict]] = {}
    for r in rows:
        by_q.setdefault(r["query"], {})[r["k"]] = r
    ks = sorted({r["k"] for r in rows})
    k_lo, k_hi = ks[0], ks[-1]
    ratio = k_hi / k_lo
    lines = [
        marker.strip(),
        "",
        f"`scale_probe.py steepest` (r14, VERDICT r13 #4): the three "
        f"steepest ×session queries from the sf1 rung, measured at "
        f"k={k_lo} (sf1) and k={k_hi} (sf{k_hi // 10}) in ONE session, "
        f"best-of-2, with the cost-term split read from the executed "
        f"plan's SQL metrics. Sub-linear = wall factor ≤ {ratio:g}× for "
        f"{ratio:g}× data; the scan/shuffle columns name WHICH linear "
        "term carries the growth.",
        "",
        f"| query | sf1 wall | sf{k_hi // 10} wall | ×wall | scan MB "
        f"{k_lo}→{k_hi} | shuffle MB {k_lo}→{k_hi} | shuffle rows ×"
        " | dominant term |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name in STEEPEST:
        lo, hi = by_q[name][k_lo], by_q[name][k_hi]
        f_wall = round(hi["wall_s"] / lo["wall_s"], 1)
        f_rows = (
            round(hi["shuffle_rows"] / lo["shuffle_rows"], 1)
            if lo["shuffle_rows"]
            else float("nan")
        )
        lines.append(
            f"| {name} | {lo['wall_s']} | {hi['wall_s']} | {f_wall}× |"
            f" {lo['scan_mb']}→{hi['scan_mb']} |"
            f" {lo['shuffle_mb']}→{hi['shuffle_mb']} | {f_rows}× |"
            f" {_STEEP_TERMS[name]} |"
        )
    worst = max(
        round(by_q[n][k_hi]["wall_s"] / by_q[n][k_lo]["wall_s"], 1) for n in STEEPEST
    )
    lines += [
        "",
        f"Worst wall factor {worst}× for {ratio:g}× data — "
        + (
            "all three stay sub-linear one rung past sf1; the growth "
            "is the named linear data term in each plan, not a hidden "
            "quadratic."
            if worst <= ratio
            else "ABOVE linear: see the named term for the offender."
        ),
    ]
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def asof_sf6_probe(spark=None, ks=(10, 60), runs: int = 2) -> list[dict]:
    """r15 (VERDICT r14 #1): the sf6 as-of rung rerun with ZERO hand
    partition sweep. The engine session owns the sizing rule
    (session.initial_shuffle_partitions), so the rung that spilled at
    the fixed 32-partition default (r14 addendum: 8.5x wall for 6x
    data; hand-swept 256 restored 5.2x) must land sub-linear-ish out
    of the box. ASSERTS factor <= 5.5x (the swept optimum + margin) —
    a failure here means the rule regressed, not the operator.

    r16 (VERDICT r15 #5): each rung's TIMED session is now built with
    ``$SPARK_GRAFT_SF_DIR`` pointing at the rung's own generated data
    dir — the documented production wiring — so the rung certifies the
    DATA-PROPORTIONAL ceiling (``max(floor, bytes/4MiB)``: ~256 at the
    sf6 rung's ~1 GB), not the 8x-cores fallback the r15 run exercised
    (probe sessions had no SF_DIR, so the fallback ceiling — which
    happens to also be 256 on this box — carried the rung). Data gen
    runs in a separate throwaway session (its ceiling is irrelevant to
    the claim); the passed ``spark`` is ignored and each rung times
    against a fresh session whose recorded ``initial_partitions`` is
    the rule's own output for that rung's bytes. No hand-set knobs
    anywhere."""
    if spark is not None:
        spark.stop()
    qs = all_queries()
    out = []
    saved_env = os.environ.get("SPARK_GRAFT_SF_DIR")
    for k in ks:
        d = tempfile.mkdtemp(prefix=f"asofsf6_k{k}_")
        gen = get_spark(app_name=f"asofsf6_gen_k{k}")
        t0 = time.perf_counter()
        replicate(gen, d, k, only=("events", "orders", "customer"))
        build_s = round(time.perf_counter() - t0, 1)
        gen.stop()
        os.environ["SPARK_GRAFT_SF_DIR"] = d
        try:
            spark_k = get_spark(app_name=f"scale_probe_asofsf6_k{k}")
        finally:
            if saved_env is None:
                os.environ.pop("SPARK_GRAFT_SF_DIR", None)
            else:
                os.environ["SPARK_GRAFT_SF_DIR"] = saved_env
        best, vols = float("inf"), None
        for _ in range(runs):
            t0 = time.perf_counter()
            df = qs["events_asof_order"].fn(spark_k, d)
            df.collect()
            dt = time.perf_counter() - t0
            if dt < best:
                best, vols = dt, _plan_volumes(df)
        row = {
            "k": k,
            "wall_s": round(best, 3),
            **vols,
            "replicate_build_s": build_s,
            "initial_partitions": spark_k.conf.get(
                "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
            ),
            "shuffle_partitions": spark_k.conf.get("spark.sql.shuffle.partitions"),
        }
        spark_k.stop()
        out.append(row)
        print(json.dumps({"asof_sf6": row}), flush=True)
        shutil.rmtree(d, ignore_errors=True)
    factor = out[-1]["wall_s"] / out[0]["wall_s"]
    assert factor <= 5.5, (
        f"sf6 as-of rung REGRESSED to {factor:.1f}x for 6x data under the "
        "engine default session — the AQE ceiling rule is not holding"
    )
    return out


def write_asof_sf6_section(rows: list[dict]) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## sf6 as-of rung under the engine default session (no hand sweep)"
    text, tail_sections = _splice_section(text, marker)
    lo, hi = rows[0], rows[-1]
    ratio = hi["k"] / lo["k"]
    factor = round(hi["wall_s"] / lo["wall_s"], 1)
    lines = [
        marker.strip(),
        "",
        "`scale_probe.py asofsf6` (r15, VERDICT r14 #1; re-recorded "
        "r16, VERDICT r15 #5): the r14 sf6 addendum's spill was fixed "
        "by a HAND sweep to 256 partitions; the engine now owns the "
        "sizing in TWO engine-side pieces, and this rung measured that "
        "the first alone is NOT enough: (1) the session derives the "
        "AQE `initialPartitionNum` ceiling from the DATA BYTES "
        "(`session.initial_shuffle_partitions`: `max(floor, "
        "$SPARK_GRAFT_SF_DIR bytes / 4 MiB)` — each rung's timed "
        "session is built with the env var pointing at that rung's "
        "generated dir, the documented production wiring, so the "
        "recorded `initialPartitionNum` below is the rule's own output "
        "for the rung's bytes, not the 8x-cores fallback the r15 run "
        "exercised) so implicit shuffles start data-proportional and "
        "AQE coalesces DOWN — but AQE coalesces by BYTES, and the "
        "as-of window's shuffle is byte-light/memory-heavy (~50x "
        "expansion into the sort), so AQE squeezes it back to ~cores; "
        "(2) `operators/temporal.py` therefore derives an explicit "
        "keyed spread from the SOURCE BYTES "
        "(`session.spread_partitions`, ~0.75 MB scan bytes per "
        "partition — the measured spill-free density), which AQE never "
        "coalesces and which satisfies the window's distribution (no "
        "extra exchange). This rung runs `events_asof_order` at sf1 "
        "and sf6, each on a fresh UNMODIFIED engine session over that "
        "rung's data; the probe asserts the factor (<= 5.5x) so a "
        "regression in either piece fails loudly.",
        "",
        "| k | wall (s) | scan MB | shuffle MB | shuffle rows | initialPartitionNum | shuffle.partitions |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['k']} | {r['wall_s']} | {r['scan_mb']} | {r['shuffle_mb']} |"
            f" {r['shuffle_rows']} | {r['initial_partitions']} |"
            f" {r['shuffle_partitions']} |"
        )
    lines += [
        "",
        f"Wall factor **{factor}x for {ratio:g}x data** with zero "
        "hand-set partitions (r14: 8.5x at the fixed 32 default, 5.2x "
        "after the manual 256 sweep). The rule, not the sweep, now "
        "carries the rung; `tests/test_session_sizing.py` pins the "
        "conf wiring.",
    ]
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def ttl_scale_probe(spark, month_counts=(24, 240, 960)) -> list[dict]:
    """Round-14 (ST9 at scale): operability of the doom→grace→reap
    retention contract when a table holds MANY month partitions (960
    months = an 80-year lake, far past any real retention window).
    Every retention step is metadata-only — marker stats and renames,
    no Spark job — so the costs to pin are the driver-side listing
    walls: the no-TTL-state fast path (one listing), the marker-aware
    listing with half the partitions doomed, the read_table plan+exec
    on each, and the doom/reap passes themselves. All should scale
    linearly in partition count at millisecond scale."""
    import os as _os
    from datetime import date as _date

    from clickhouse_realtime_analytics_demo_spark.sources import generator, writer
    from clickhouse_realtime_analytics_demo_spark.streaming import retention

    out = []
    for n in month_counts:
        base = tempfile.mkdtemp(prefix=f"ttlscale{n}_")
        writer.write_table(
            generator.events(spark, n=2000, n_users=50), base, "events"
        )
        tdir = Path(base) / "events"
        seed = next(iter(sorted(tdir.glob("yyyymm=*"))))
        seed_files = sorted(seed.glob("*.parquet")) + sorted(seed.glob(".*.crc"))
        months = []
        for i in range(n):
            val = 190001 + (i // 12) * 100 + (i % 12)
            months.append(val)
            d = tdir / f"yyyymm={val}"
            if not d.exists():
                d.mkdir()
                for f in seed_files:
                    _os.link(f, d / f.name)

        def best(fn, reps=3):
            b = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                b = min(b, time.perf_counter() - t0)
            return round(b * 1000, 1)

        listing_fast_ms = best(lambda: retention.ttl_live_listing(str(tdir)))
        read_fast_ms = best(
            lambda: writer.read_table(spark, base, "events").count(), reps=2
        )
        mid = months[len(months) // 2]
        cutoff = _date(mid // 100, mid % 100, 1)
        t0 = time.perf_counter()
        report = retention.apply_ttl(spark, str(tdir), "event_date", cutoff)
        doom_ms = round((time.perf_counter() - t0) * 1000, 1)
        listing_doomed_ms = best(lambda: retention.ttl_live_listing(str(tdir)))
        read_doomed_ms = best(
            lambda: writer.read_table(spark, base, "events").count(), reps=2
        )
        t0 = time.perf_counter()
        reaped = retention.reap_expired(str(tdir), grace_seconds=0.0)
        reap_ms = round((time.perf_counter() - t0) * 1000, 1)
        row = {
            "months": n + 3,  # + the 3 real generator months
            "doomed": len(report["dropped_partitions"]),
            "reaped": len(reaped),
            "listing_fast_ms": listing_fast_ms,
            "read_fast_ms": read_fast_ms,
            "doom_pass_ms": doom_ms,
            "listing_doomed_ms": listing_doomed_ms,
            "read_doomed_ms": read_doomed_ms,
            "reap_pass_ms": reap_ms,
        }
        out.append(row)
        print(json.dumps({"ttl_scale": row}), flush=True)
        shutil.rmtree(base, ignore_errors=True)
    return out


def write_ttl_scale_section(rows: list[dict]) -> None:
    md = Path("SCALEPROBE.md")
    text = md.read_text() if md.exists() else ""
    marker = "\n## TTL retention at many partitions (metadata-only costs)"
    text, tail_sections = _splice_section(text, marker)
    lines = [
        marker.strip(),
        "",
        "`scale_probe.py ttlscale` (r14, after the doom→grace→reap "
        "rewrite): a lake table grown to up to ~960 month partitions "
        "(an 80-year lake — far past any real retention window), half "
        "of them doomed in one pass. Every retention step is marker "
        "stats + renames, never a Spark job, so the operability "
        "question is purely the driver-side listing walls — pinned "
        "here as linear-in-partitions at millisecond scale "
        "(`read_*_ms` includes the Spark count on ~2k rows; the "
        "marker-aware read path adds only the listing delta).",
        "",
        "| months | doomed/reaped | listing fast (ms) | read fast (ms) |"
        " doom pass (ms) | listing doomed (ms) | read doomed (ms) |"
        " reap pass (ms) |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['months']} | {r['doomed']}/{r['reaped']} |"
            f" {r['listing_fast_ms']} | {r['read_fast_ms']} |"
            f" {r['doom_pass_ms']} | {r['listing_doomed_ms']} |"
            f" {r['read_doomed_ms']} | {r['reap_pass_ms']} |"
        )
    lo, hi = rows[0], rows[-1]
    lines += [
        "",
        f"Fast-path listing {lo['listing_fast_ms']} → "
        f"{hi['listing_fast_ms']} ms and doomed-path "
        f"{lo['listing_doomed_ms']} → {hi['listing_doomed_ms']} ms for "
        f"{lo['months']} → {hi['months']} partitions — linear, "
        "milliseconds, and amortized into a scan that costs seconds at "
        "any real SF. Doom and reap passes stay O(partitions) renames; "
        "at 100 TB the partition COUNT is still just months×tables, so "
        "these numbers are already the production regime.",
    ]
    md.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n" + tail_sections)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "asofsf6":
        # the probe manages its own per-rung sessions (r16, VERDICT
        # r15 #5): no caller supplies a partition count, and each
        # rung's session derives its ceiling from that rung's data dir
        rows = asof_sf6_probe()
        write_asof_sf6_section(rows)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "ttlscale":
        spark = get_spark(app_name="scale_probe_ttl_scale")
        rows = ttl_scale_probe(spark)
        write_ttl_scale_section(rows)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "steepest":
        spark = get_spark(app_name="scale_probe_steepest")
        rows = steepest_rung_probe(spark)
        write_steepest_rung_section(rows)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "stateretention":
        spark = get_spark(app_name="scale_probe_state_retention")
        rows = state_retention_probe(spark)
        write_state_retention_section(rows)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "benchsf1":
        spark = get_spark(app_name="scale_probe_bench_sf1")
        row = bench_sf1_probe(spark)
        write_bench_sf1_section(row)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "neardupingest":
        spark = get_spark(app_name="scale_probe_neardup_ingest")
        sizes = (
            tuple(int(a) for a in sys.argv[2:])
            if len(sys.argv) > 2
            else (10_000, 50_000, 200_000)
        )
        rows = neardup_ingest_probe(spark, corpus_sizes=sizes)
        write_neardup_ingest_section(rows)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "neardupparts":
        spark = get_spark(app_name="scale_probe_neardup_parts")
        rows = neardup_parts_probe(spark)
        write_neardup_parts_section(rows, corpus=100_000)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "dedupingest":
        spark = get_spark(app_name="scale_probe_dedup_ingest")
        rows = dedup_ingest_probe(spark)
        write_dedup_ingest_section(rows)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "cc":
        spark = get_spark(app_name="scale_probe_cc")
        rows = cc_probe(spark)
        write_cc_section(rows)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "skew":
        spark = get_spark(app_name="scale_probe_skew")
        rows = skew_probe(spark)
        write_skew_section(rows)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "router":
        k = int(sys.argv[2]) if len(sys.argv) > 2 else 50
        spark = get_spark(app_name="scale_probe_router")
        rows = router_probe(spark, k)
        write_router_section(rows, k)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "asofhotkey":
        spark = get_spark(app_name="scale_probe_asof_hotkey")
        rows = asof_hotkey_probe(spark)
        write_asof_hotkey_section(rows)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "temporal":
        spark = get_spark(app_name="scale_probe_temporal")
        rows = temporal_probe(spark)
        write_temporal_section(rows)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "semdedup":
        spark = get_spark(app_name="scale_probe_semdedup", shuffle_partitions=64)
        write_semdedup_section(semdedup_probe(spark))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "bpebig":
        ks = tuple(int(a) for a in sys.argv[2:]) or (8192, 16384)
        spark = get_spark(app_name="scale_probe_bpe_big")
        write_bpe_big_section(bpe_big_probe(spark, merge_counts=ks))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "bpe4096":
        spark = get_spark(app_name="scale_probe_bpe4096")
        write_bpe_4096_section(bpe_4096_probe(spark))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "bpebatched":
        spark = get_spark(app_name="scale_probe_bpe_batched")
        rows = bpe_batched_probe(spark)
        write_bpe_batched_section(rows)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "tfidf":
        spark = get_spark(app_name="scale_probe_tfidf")
        rows = tfidf_probe(spark)
        write_tfidf_section(rows)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "statedays":
        days = int(sys.argv[2]) if len(sys.argv) > 2 else 10
        spark = get_spark(app_name="scale_probe_statedays")
        write_statedays_section(statedays_probe(spark, days=days))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "stateparts":
        spark = get_spark(app_name="scale_probe_stateparts")
        write_stateparts_section(stateparts_probe(spark))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "heavyhitters":
        spark = get_spark(app_name="scale_probe_heavyhitters")
        write_heavyhitters_section(heavyhitters_probe(spark))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "ivfrecall":
        k = int(sys.argv[2]) if len(sys.argv) > 2 else 40
        spark = get_spark(app_name="scale_probe_ivf_recall")
        write_ivf_recall_section(ivf_recall_probe(spark, k=k))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "annstored":
        spark = get_spark(app_name="scale_probe_annstored")
        write_ann_stored_section(ann_stored_probe(spark))
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "annint8":
        spark = get_spark(app_name="scale_probe_annint8")
        rows = ann_int8_probe(spark)
        write_ann_int8_section(rows)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "bpeencode":
        spark = get_spark(app_name="scale_probe_bpeencode")
        rows = bpe_encode_probe(spark)
        write_bpe_encode_section(rows)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "bpesynth":
        spark = get_spark(app_name="scale_probe_bpe_synth")
        rows = bpe_synth_probe(spark)
        write_bpe_synth_section(rows)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "bpe":
        spark = get_spark(app_name="scale_probe_bpe")
        rows = bpe_probe(spark)
        write_bpe_section(rows)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "textops":
        spark = get_spark(app_name="scale_probe_textops")
        rows = textops_probe(spark)
        write_textops_section(rows)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "lshsplit":
        k = int(sys.argv[2]) if len(sys.argv) > 2 else 40
        # same data-proportional partition sizing as corpusprep40
        spark = get_spark(
            app_name="scale_probe_lshsplit", shuffle_partitions=max(64, 4 * k)
        )
        row = lshsplit_probe(spark, k)
        write_lshsplit_section(row)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "corpusprep100":
        # DELIBERATELY the default session (VERDICT r14 #5): the
        # operator and the session own every partition count now
        spark = get_spark(app_name="scale_probe_corpusprep100")
        row = corpusprep100_probe(spark)
        write_corpusprep100_section(row)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "corpusprep40":
        k = int(sys.argv[2]) if len(sys.argv) > 2 else 40
        # Partition count must FOLLOW the data — the first 40× attempt
        # on the default 32-partition session died with
        # AGGREGATE_OUT_OF_MEMORY: the operator derives its checkpoint
        # partitioning from spark.sql.shuffle.partitions, so each
        # localCheckpointed shingle block reached ~900 MB and cached
        # storage starved the hash aggregates' page allocations. ~4
        # partitions per 1× of corpus keeps blocks in the same
        # ~25 MB band the 1× run enjoys — the identical sizing rule a
        # cluster job applies via shuffle.partitions / maxPartitionBytes.
        spark = get_spark(
            app_name="scale_probe_corpusprep40",
            shuffle_partitions=max(64, 4 * k),
        )
        row = corpusprep40_probe(spark, k)
        write_corpusprep40_section(row)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "corpusprep":
        spark = get_spark(app_name="scale_probe_corpusprep")
        rows = corpusprep_probe(spark)
        write_corpusprep_section(rows)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "funnelstate":
        spark = get_spark(app_name="scale_probe_funnel_state")
        rows = funnel_state_probe(spark)
        write_funnel_section(rows)
        spark.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "mv":
        spark = get_spark(app_name="scale_probe_mv")
        rows = mv_probe(spark)
        write_mv_section(rows)
        spark.stop()
        return
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark(app_name="scale_probe")
    registry = all_queries()
    results: dict[int, dict[str, float]] = {}
    joins: dict[int, dict[str, str]] = {}
    for k in ks:
        d = tempfile.mkdtemp(prefix=f"scaleprobe_k{k}_")
        replicate(spark, d, k)
        timings = {name: float("inf") for name in QUERIES}
        joins[k] = {}
        for name in QUERIES:  # warm codegen for this K's plans
            df = registry[name].fn(spark, d)
            df.collect()
            joins[k][name] = _join_mix(df)
        for _ in range(ROUNDS):  # round-robin: spread samples over bursts
            for name in QUERIES:
                t0 = time.perf_counter()
                registry[name].fn(spark, d).collect()
                timings[name] = min(timings[name], time.perf_counter() - t0)
        results[k] = {n: round(t, 3) for n, t in timings.items()}
        print(json.dumps({"k": k, "queries": results[k], "joins": joins[k]}), flush=True)
        shutil.rmtree(d, ignore_errors=True)
    base = results[ks[0]]
    lines = [
        "# SCALEPROBE — wall-clock vs data size (replicated sf0.1, local[32])",
        "",
        f"Best-of-{ROUNDS} warm timings, repetitions round-robined across"
        " queries (this box's same-plan wall-clock varies up to ~18x"
        " between consecutive runs — measured in scale_probe.py's"
        " docstring — so treat ratios as upper bounds and attribute"
        " anomalies via the join-mix column, which names the adaptive"
        f" join strategies actually executed). Ratios are vs K={ks[0]};"
        " linear scaling ⇒ ratio ≈ K. BHJ=broadcast hash, SMJ=sort-merge,"
        " SHJ=shuffled hash join.",
        "",
        "| query | "
        + " | ".join(f"K={k} (s) | ratio | joins" for k in ks)
        + " |",
        "|---|" + "---|" * (3 * len(ks)),
    ]
    for name in QUERIES:
        cells = []
        for k in ks:
            t = results[k][name]
            cells.append(f"{t}")
            cells.append(f"{round(t / base[name], 1) if base[name] else '-'}x")
            cells.append(joins[k][name])
        lines.append(f"| {name} | " + " | ".join(cells) + " |")
    # Preserve every appended "## section" (MV, router, skew, cc,
    # ingest probes) — only the header + main table are rewritten.
    md = Path("SCALEPROBE.md")
    tail = ""
    if md.exists():
        old = md.read_text()
        idx = old.find("\n## ")
        if idx != -1:
            tail = old[idx:]
    md.write_text("\n".join(lines) + "\n" + tail)
    spark.stop()


if __name__ == "__main__":
    main()
