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


# ---------------------------------------- pure-Python codecs (r7 #6)
#
# Fixture builders write REAL uncompressed files byte-by-byte, so the
# decode tests are bit-exact against independently-computed values.

import math
import struct
from collections import Counter


def make_bmp(pixels: list[list[tuple[int, int, int]]], bpp: int = 24) -> bytes:
    """Minimal BITMAPINFOHEADER BMP from row-major (r,g,b) pixels."""
    h, w = len(pixels), len(pixels[0])
    step = bpp // 8
    stride = ((w * step + 3) // 4) * 4
    raster = bytearray()
    for row in reversed(pixels):  # bottom-up storage
        line = bytearray()
        for r, g, b in row:
            line += bytes([b, g, r] + ([0] if step == 4 else []))
        line += b"\x00" * (stride - len(line))
        raster += line
    header = b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(raster), 2835, 2835, 0, 0)
    return header + info + bytes(raster)


def make_ppm(pixels: list[list[tuple[int, int, int]]], comment: str | None = None) -> bytes:
    h, w = len(pixels), len(pixels[0])
    head = b"P6\n" + (f"# {comment}\n".encode() if comment else b"") + f"{w} {h}\n255\n".encode()
    return head + bytes(c for row in pixels for px in row for c in px)


def make_wav(seconds: float, rate: int = 8000, channels: int = 1, bits: int = 16) -> bytes:
    n_bytes = int(seconds * rate) * channels * (bits // 8)
    data = bytes(i % 251 for i in range(n_bytes))
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
                      channels * bits // 8, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


_PIXELS = [
    [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
    [(10, 20, 30), (200, 200, 200), (0, 0, 0)],
]


def _expected_stats(pixels):
    flat = bytes(c for row in pixels for px in row for c in px)
    n = len(flat)
    counts = Counter(flat)
    mean = sum(flat) / n
    entropy = -sum((c / n) * math.log2(c / n) for c in counts.values())
    return n, mean, entropy


def test_bmp_decode_bit_exact():
    for bpp in (24, 32):
        feats = multimodal.decode_image(make_bmp(_PIXELS, bpp=bpp), fake=False)
        n, mean, entropy = _expected_stats(_PIXELS)
        assert (feats["width"], feats["height"]) == (3, 2)
        assert feats["n_bytes"] == n
        assert feats["byte_mean"] == mean
        assert feats["byte_entropy"] == entropy
    # 24- and 32-bit encodings of the same pixels agree on everything
    a = multimodal.decode_image(make_bmp(_PIXELS, 24), fake=False)
    b = multimodal.decode_image(make_bmp(_PIXELS, 32), fake=False)
    assert a == b


def test_ppm_decode_matches_bmp_and_handles_comments():
    ppm = multimodal.decode_image(make_ppm(_PIXELS, comment="fixture"), fake=False)
    bmp = multimodal.decode_image(make_bmp(_PIXELS), fake=False)
    # identical pixels -> identical features across containers,
    # including the luma average-hash
    assert ppm == bmp


def test_phash_groups_similar_images():
    base = [[((x * 16) % 256, (y * 16) % 256, 40) for x in range(16)] for y in range(16)]
    near = [row[:] for row in base]
    near[0][0] = (base[0][0][0] + 1, base[0][0][1], base[0][0][2])  # 1-px tweak
    inverted = [[(255 - r, 255 - g, 255 - b) for r, g, b in row] for row in base]
    h0 = multimodal.decode_image(make_bmp(base), fake=False)["phash"]
    h1 = multimodal.decode_image(make_bmp(near), fake=False)["phash"]
    h2 = multimodal.decode_image(make_bmp(inverted), fake=False)["phash"]
    assert h0 == h1  # perceptually identical
    assert h0 != h2  # structurally different


def test_wav_decode_bit_exact():
    feats = multimodal.decode_audio(make_wav(1.5, rate=8000, channels=2, bits=16), fake=False)
    assert feats == {
        "format": "wav",
        "channels": 2,
        "sample_rate": 8000,
        "bits_per_sample": 16,
        "duration_ms": 1500,
        "n_bytes": 12000 * 4,
    }
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"\x00" * 64, fake=False)


def test_dirty_payloads_fall_back_to_stub_under_auto():
    """ADVICE r7: a payload that SNIFFS as bmp/ppm/wav but fails to
    parse (text starting with the magic, truncated file, malformed
    header) must take the deterministic stand-in under fake=None — not
    propagate out of mapInPandas and fail the whole job. fake=False
    still raises (the caller demanded a real decode)."""
    dirty_images = [
        b"BM this is text that merely starts with the BMP magic bytes....",
        b"P6 not really a pixmap",
        make_bmp(_PIXELS)[:30],  # truncated mid-header
    ]
    if not multimodal.pil_available():
        for p in dirty_images:
            assert multimodal.decode_image(p) == multimodal.decode_image(p, fake=True)
            with pytest.raises((ValueError, IndexError, struct.error)):
                multimodal.decode_image(p, fake=False)
    # WAV sniffs fine but has no fmt/data chunk
    no_chunks = b"RIFF" + struct.pack("<I", 8) + b"WAVEjunk"
    # malformed fmt chunk with rate=0: previously ZeroDivisionError
    zfmt = struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)
    zbody = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(zfmt)) + zfmt
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    zero_rate = b"RIFF" + struct.pack("<I", len(zbody)) + zbody
    for p in (no_chunks, zero_rate):
        assert multimodal.decode_audio(p) == multimodal.decode_audio(p, fake=True)
        with pytest.raises(ValueError):
            multimodal.decode_audio(p, fake=False)


def test_dirty_media_table_through_spark(spark):
    """Mixed clean/dirty media table end-to-end: the job completes and
    only the dirty row takes the stand-in."""
    dirty = b"BM plain text, definitely not a bitmap"
    rows = [(1, 1, make_bmp(_PIXELS), None), (2, 2, dirty, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = {r.media_id: r for r in multimodal.extract_image_features(media).collect()}
    assert (feats[1].width, feats[1].height) == (3, 2)
    expect = multimodal.decode_image(dirty, fake=True)
    assert feats[2].phash == expect["phash"]
    assert feats[2].width == expect["width"]


def test_real_fixture_features_through_spark(spark):
    """The VERDICT r6 #6 gate: the image-features operator produces
    REAL (not stand-in) width/height/entropy for BMP fixtures, and the
    audio operator real durations for WAVs — end-to-end through the
    Arrow mapInPandas plumbing with fake=None auto-selection."""
    imgs = [
        (1, 1, make_bmp(_PIXELS), None),
        (2, 2, make_ppm(_PIXELS), None),
    ]
    media = spark.createDataFrame(imgs, multimodal.MEDIA_SCHEMA)
    feats = {r.media_id: r for r in multimodal.extract_image_features(media).collect()}
    n, mean, entropy = _expected_stats(_PIXELS)
    for mid in (1, 2):
        assert (feats[mid].width, feats[mid].height) == (3, 2)
        assert feats[mid].byte_mean == mean
        assert feats[mid].byte_entropy == entropy
    assert feats[1].phash == feats[2].phash

    wavs = [(3, 3, make_wav(2.0), None), (4, 4, b"not audio", None)]
    audio = spark.createDataFrame(wavs, multimodal.MEDIA_SCHEMA)
    rows = {r.media_id: r for r in multimodal.extract_audio_features(audio).collect()}
    assert rows[3].format == "wav" and rows[3].duration_ms == 2000
    assert rows[3].sample_rate == 8000 and rows[3].channels == 1
    assert rows[4].format == "fake"  # mixed table: stub only where needed


# ----------------------------------------- pure-Python PNG codec (r8)


def test_png_decode_matches_bmp_and_ppm():
    # identical pixels -> identical features across all three
    # containers, including the luma average-hash; PNG is the real
    # compressed path (zlib inflate + defilter)
    png = multimodal.decode_image(multimodal.encode_png(_PIXELS), fake=False)
    bmp = multimodal.decode_image(make_bmp(_PIXELS), fake=False)
    assert png == bmp


def test_png_all_five_filters_bit_exact():
    # 13x8 gradient: encode_png stores row y with filter y % 5, so one
    # payload exercises None/Sub/Up/Average/Paeth; the gradient makes
    # every filter's prediction nontrivial
    w, h, base = 13, 8, 40
    pixels = [[(base + x + 2 * y,) * 3 for x in range(w)] for y in range(h)]
    feats = multimodal.decode_image(multimodal.encode_png(pixels), fake=False)
    n, mean, entropy = _expected_stats(pixels)
    assert (feats["width"], feats["height"]) == (w, h)
    assert feats["n_bytes"] == n
    assert feats["byte_mean"] == mean == base + (w - 1) / 2 + (h - 1)
    assert feats["byte_entropy"] == entropy


def test_png_rgba_and_gray_feature_parity():
    w, h, base = 9, 6, 70
    rgb = [[(base + x + 2 * y,) * 3 for x in range(w)] for y in range(h)]
    rgba = [[px + (17,) for px in row] for row in rgb]
    gray = [[(px[0],) for px in row] for row in rgb]
    f_rgb = multimodal.decode_image(multimodal.encode_png(rgb, color_type=2), fake=False)
    f_rgba = multimodal.decode_image(multimodal.encode_png(rgba, color_type=6), fake=False)
    f_gray = multimodal.decode_image(multimodal.encode_png(gray, color_type=0), fake=False)
    assert f_rgba == f_rgb  # alpha dropped from content stats
    assert f_gray == f_rgb  # gray replicated to RGB


def test_dirty_png_falls_back_to_stub_under_auto():
    good = multimodal.encode_png(_PIXELS)
    dirty = [
        b"\x89PNG\r\n\x1a\n" + b"text that merely starts with the magic",
        good[:40],                      # truncated mid-chunk
        good[:33] + b"\x00" * 20,       # IDAT replaced with zeros: zlib.error
    ]
    for payload in dirty:
        feats = multimodal.decode_image(payload, fake=None)  # stand-in, no raise
        assert feats["n_bytes"] == len(payload)
        with pytest.raises(multimodal._DIRTY_PAYLOAD_ERRORS):
            multimodal.decode_image(payload, fake=False)
