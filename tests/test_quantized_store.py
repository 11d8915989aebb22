"""Write-time int8 embedding store (sources/quantized.py, VERDICT r10
#3): the store must (1) hold honest int8 at rest (tinyint), (2) score
bit-identically to the inline quantize path, (3) self-freshen when the
source parquet is regenerated — /root/testdata IS rewritten every
driver round, so a stale store would silently serve last round's
vectors — and (4) not rebuild when the source is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.operators import similarity
from clickhouse_realtime_analytics_demo_spark.sources import quantized
from tests.conftest import SF_DIR


def test_store_schema_and_agreement_with_inline(spark, tmp_path):
    qz = quantized.read_store(spark, SF_DIR, root=str(tmp_path))
    schema = {f.name: f.dataType.simpleString() for f in qz.schema.fields}
    assert schema == {
        "vec_id": "bigint",
        "qvec": "array<tinyint>",
        "qscale": "double",
    }
    stored = similarity.quantized_topk_scan(qz, query_id=0, k=10).collect()
    from clickhouse_realtime_analytics_demo_spark import catalog

    emb = catalog.table(spark, SF_DIR, "embeddings")
    inline = similarity.quantized_topk(emb, query_id=0, k=10).collect()
    assert [tuple(r) for r in stored] == [tuple(r) for r in inline]


def test_store_reuse_and_refresh(spark, tmp_path):
    p1 = quantized.ensure_store(spark, SF_DIR, root=str(tmp_path))
    marker = p1 / "_SOURCE.json"
    stamp = marker.stat().st_mtime_ns
    # unchanged source -> no rebuild (marker untouched)
    quantized.ensure_store(spark, SF_DIR, root=str(tmp_path))
    assert marker.stat().st_mtime_ns == stamp

    # a regenerated source (different mtime, same path shape) -> rebuild.
    # Copy the corpus so we can touch it without writing to testdata.
    import shutil

    src_dir = tmp_path / "sf_copy"
    src_dir.mkdir()
    shutil.copy(f"{SF_DIR}/embeddings.parquet", src_dir / "embeddings.parquet")
    pa = quantized.ensure_store(spark, str(src_dir), root=str(tmp_path))
    assert pa != p1  # per-source isolation: different dir per corpus
    ma = pa / "_SOURCE.json"
    t0 = ma.stat().st_mtime_ns
    os.utime(src_dir / "embeddings.parquet", ns=(1, 1))  # simulate regeneration
    quantized.ensure_store(spark, str(src_dir), root=str(tmp_path))
    assert ma.stat().st_mtime_ns != t0  # marker rewritten -> store rebuilt


def test_store_is_smaller_than_float(spark, tmp_path):
    # the point of the store: bytes at rest. tinyint + per-vector scale
    # must come in well under the float64-list source column encoding.
    p = quantized.ensure_store(spark, SF_DIR, root=str(tmp_path))
    store_bytes = sum(f.stat().st_size for f in (p / "data").rglob("*.parquet"))
    src_bytes = os.stat(f"{SF_DIR}/embeddings.parquet").st_size
    assert store_bytes < src_bytes / 2, (store_bytes, src_bytes)


def test_int_cosine_wide_int32_no_wrap(spark):
    # ADVICE r10: elements are widened to bigint BEFORE multiplying;
    # 100000^2 overflows int32 — the old form wrapped silently.
    df = spark.createDataFrame([([100_000, 0], [100_000, 0])], "a array<int>, b array<int>")
    (got,) = df.select(similarity.int_cosine(F.col("a"), F.col("b")).alias("c")).collect()
    assert abs(got["c"] - 1.0) < 1e-12
