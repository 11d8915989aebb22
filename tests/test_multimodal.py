"""Multimodal plumbing: schemas, Arrow batch shapes, partition
preservation, stub-codec determinism, and the oracle-checked metadata/
frame-spine queries."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, compare_with_oracle

from clickhouse_realtime_analytics_demo_spark.catalog import table
from clickhouse_realtime_analytics_demo_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = table(spark, SF_DIR, "documents").filter("doc_id < 100")
    return multimodal.synthesize_media(docs)


def _shape(schema):
    # (name, simpleString) pairs — nullability differs between the
    # declared schema and what non-null expressions synthesize.
    return [(f.name, f.dataType.simpleString()) for f in schema.fields]


def test_media_schema(media):
    assert _shape(media.schema) == _shape(multimodal.MEDIA_SCHEMA)
    row = media.filter("media_id = 1").collect()[0]
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta.size_bytes == len(row.payload)
    assert row.meta.duration_ms == 10 * len(row.payload)


def test_decode_codec_selection_is_env_conditional():
    """fake=None auto-selects the codec: PIL when importable, else
    the deterministic stub; fake=False demands the real codec."""
    if multimodal.pil_available():
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (20, 10), (120, 30, 200)).save(buf, format="PNG")
        png = buf.getvalue()
        auto = multimodal.decode_image(png)  # real decode
        assert (auto["width"], auto["height"]) == (20, 10)
        assert auto == multimodal.decode_image(png, fake=False)
    else:
        auto = multimodal.decode_image(b"abc")  # stub fallback
        assert auto == multimodal.decode_image(b"abc", fake=True)
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"abc", fake=False)


def test_distributed_features_match_driver_codec(media):
    feats = {
        r.media_id: r for r in multimodal.extract_image_features(media, fake=True).collect()
    }
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert set(feats) == set(payloads)
    for mid in list(payloads)[:20]:
        expect = multimodal.decode_image(payloads[mid], fake=True)
        got = feats[mid]
        assert got.width == expect["width"] and got.height == expect["height"]
        assert got.n_bytes == expect["n_bytes"]
        assert got.phash == expect["phash"]
        assert abs(got.byte_entropy - expect["byte_entropy"]) < 1e-9


def test_feature_extraction_preserves_partitions(media):
    m4 = media.repartition(4)
    out = multimodal.extract_image_features(m4, fake=True)
    assert out.rdd.getNumPartitions() == 4  # narrow map, no shuffle


def test_resize_contract(media):
    out = multimodal.resize_images(media.limit(5), 64, 64, fake=True).collect()
    assert len(out) == 5
    for r in out:
        assert len(r.payload) == 32  # sha256 digest stand-in
        assert r.meta.width == 64 and r.meta.height == 64
        assert r.meta.size_bytes == 32


def test_frame_sampling_count_formula(spark, media):
    frames = multimodal.sample_frames(media, every_ms=1000, fake=True)
    got = {r.media_id: r.cnt for r in frames.groupBy("media_id").count().withColumnRenamed("count", "cnt").collect()}
    for r in media.select("media_id", "meta.duration_ms").collect():
        assert got[r.media_id] == max(1, r.duration_ms // 1000)


def test_frame_payloads_deterministic(media):
    one = multimodal.sample_frames(media.filter("media_id = 1"), fake=True).orderBy("frame_index")
    a = [bytes(r.frame_payload) for r in one.collect()]
    b = [bytes(r.frame_payload) for r in one.collect()]
    assert a == b and len(set(a)) == len(a)  # stable and per-frame distinct


def test_media_meta_stats_oracle(spark):
    compare_with_oracle(spark, "media_meta_stats")


def test_media_frame_sample_oracle(spark):
    compare_with_oracle(spark, "media_frame_sample")


def test_media_image_features_runs(spark):
    from clickhouse_realtime_analytics_demo_spark.queries import all_queries

    df = all_queries()["media_image_features"].fn(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["source", "n_images", "avg_entropy", "avg_byte_mean", "distinct_phash"]
