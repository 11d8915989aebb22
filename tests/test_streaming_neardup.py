"""Near-dup dedup-at-ingest (streaming/dedup.py neardup_*).

Gates: in-batch near-dup keep-one; cross-batch and cross-run
rejection against the accepted corpus; the documented online-vs-batch
semantic divergence (rejected docs are not compared against); crash
replay idempotency; band index survives compaction.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from clickhouse_realtime_analytics_demo_spark.streaming import dedup as sdedup

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)

# ~30-token sentences; a 1-2 word edit keeps 3-shingle Jaccard ≳ 0.75
# (caught by 32-hash/8-band LSH with overwhelming probability), while
# DISTINCT base sentences share almost no shingles.
BASE_A = (
    "the quick brown fox jumps over the lazy dog while seventeen green "
    "turtles watch from the muddy river bank under a warm afternoon sun "
    "near the old stone bridge"
)
BASE_A_EDIT1 = BASE_A.replace("seventeen", "nineteen")
BASE_A_EDIT2 = BASE_A.replace("afternoon", "morning")
BASE_B = (
    "distributed query engines partition their input data across many "
    "worker nodes so that large analytical scans and joins can proceed "
    "in parallel without any single machine bottleneck"
)
BASE_B_EDIT = BASE_B.replace("large", "huge")
BASE_C = (
    "carefully written tests pin down the exact behaviour of every "
    "operator so that later refactors cannot silently change results "
    "for any customer workload in production clusters"
)


def _write_drop(spark, src, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _run(spark, src, out, ckpt, **kw):
    q = sdedup.start_neardup_ingest(
        spark, src, out, ckpt, DOC_SCHEMA, available_now=True,
        max_files_per_trigger=1, **kw
    )
    q.awaitTermination(180)
    q.stop()


def _accepted_ids(spark, out):
    return sorted(
        r["doc_id"] for r in sdedup.read_accepted(spark, out).select("doc_id").collect()
    )


def test_in_batch_and_cross_batch_neardups(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    # batch 1: A and a near-dup of A (min id wins), plus B
    _write_drop(spark, src, [(1, BASE_A), (2, BASE_A_EDIT1), (3, BASE_B)])
    # batch 2: another A variant (reject vs accepted), fresh C
    _write_drop(spark, src, [(10, BASE_A_EDIT2), (11, BASE_C)])
    # batch 3: B variant (reject), exact copy of C (J=1, reject)
    _write_drop(spark, src, [(20, BASE_B_EDIT), (21, BASE_C)])
    _run(spark, src, out, ckpt)
    assert _accepted_ids(spark, out) == [1, 3, 11]
    # every accepted row carries its LSH band index
    acc = sdedup.read_accepted(spark, out)
    assert "bands" in acc.columns
    assert acc.filter(F.size("bands") != 8).count() == 0


def test_cross_run_rejection_and_replay(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    _write_drop(spark, src, [(1, BASE_A), (2, BASE_B)])
    _run(spark, src, out, ckpt)
    assert _accepted_ids(spark, out) == [1, 2]

    _write_drop(spark, src, [(30, BASE_A_EDIT1), (31, BASE_C)])
    _run(spark, src, out, ckpt)  # resumes from checkpoint
    assert _accepted_ids(spark, out) == [1, 2, 31]

    # crash replay: drop the last commit record, restart re-delivers
    commits = sorted(
        (p for p in (Path(ckpt) / "commits").iterdir() if p.name.isdigit()),
        key=lambda p: int(p.name),
    )
    commits[-1].unlink()
    crc = commits[-1].parent / f".{commits[-1].name}.crc"
    if crc.exists():
        crc.unlink()
    _run(spark, src, out, ckpt)
    assert _accepted_ids(spark, out) == [1, 2, 31]


def test_online_semantics_documented_divergence(spark, tmp_path):
    """X rejected as near-dup of accepted A; later Y near-dup of X but
    NOT of A is accepted — the documented online-vs-batch-CC
    difference (rejected docs are not retained for comparison)."""
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    # chain: A ~ X (1 edit), X ~ Y (1 more edit), A ~ Y (2 edits —
    # still near by Jaccard? make Y differ enough from A): use edits
    # at the same position compounding.
    x = BASE_A.replace("seventeen green turtles", "nineteen grey turtles")
    y = x.replace("muddy river bank", "sandy lake shore").replace(
        "warm afternoon sun", "cold evening moon"
    )
    _write_drop(spark, src, [(1, BASE_A)])
    _write_drop(spark, src, [(2, x)])
    _write_drop(spark, src, [(3, y)])
    _run(spark, src, out, ckpt)
    got = _accepted_ids(spark, out)
    assert 1 in got and 2 not in got
    # y diverged from A by enough edits to clear the threshold vs A,
    # and its true neighbor x was rejected → accepted online.
    assert 3 in got


def test_compaction_preserves_band_index(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    for i, t in enumerate((BASE_A, BASE_B, BASE_C)):
        _write_drop(spark, src, [(i, t)])
    _run(spark, src, out, ckpt, compact_max_parts=1)
    from clickhouse_realtime_analytics_demo_spark.streaming import parts as parts_store
    assert len(parts_store.live_part_dirs(out)) <= 3  # folding happened
    # post-compaction, a near-dup of a doc that lives in the MERGED
    # part is still rejected (the band index survived the fold)
    _write_drop(spark, src, [(50, BASE_B_EDIT), (51, BASE_A_EDIT2)])
    _run(spark, src, out, ckpt, compact_max_parts=1)
    assert _accepted_ids(spark, out) == [0, 1, 2]


def test_bucket_cap_trade_off(spark, tmp_path):
    """The quadratic-blowup valve and its documented cost: identical
    docs share ALL bands, so a cap below the group size drops every
    shared bucket and the group slips near-dup detection (run exact
    dedup upstream for that case); without the cap, one survivor."""
    rows = [(i, BASE_A) for i in range(10)] + [(20, BASE_B)]
    batch = spark.createDataFrame(rows, DOC_SCHEMA)

    out1 = str(tmp_path / "nocap")
    sdedup.neardup_batch(spark, batch, out1, batch_id=0)
    assert _accepted_ids(spark, out1) == [0, 20]

    out2 = str(tmp_path / "cap5")
    sdedup.neardup_batch(spark, batch, out2, batch_id=0, max_bucket_size=5)
    assert _accepted_ids(spark, out2) == sorted(r[0] for r in rows)

    # cross-corpus side: accepted mega-bucket dropped under cap → the
    # next batch's copy of BASE_A is admitted (documented trade-off);
    # BASE_B's bucket (size 1) still rejects its near-dup.
    nxt = spark.createDataFrame([(30, BASE_A), (31, BASE_B_EDIT)], DOC_SCHEMA)
    sdedup.neardup_batch(spark, nxt, out2, batch_id=1, max_bucket_size=5)
    got = _accepted_ids(spark, out2)
    assert 30 in got and 31 not in got
