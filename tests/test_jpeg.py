"""Pure-Python baseline JPEG codec: bit-exact roundtrip on the
DC-only (constant-tile) lossless corner, bounded-error roundtrip on
real gradients under Annex K tables, feature parity with the PPM
path on exactly-reconstructed pixels, honest rejection of the
non-baseline subset, dirty-payload fallback tiering."""

from __future__ import annotations

from clickhouse_realtime_analytics_demo_spark.operators import multimodal
from clickhouse_realtime_analytics_demo_spark.operators.jpeg_codec import (
    encode_jpeg,
    parse_jpeg,
)


def _gray_tiles(w: int, h: int, salt: int = 0):
    # constant value per 8×8 tile — every block is DC-only in the DCT
    # domain, so a flat quant step of 8 reconstructs bit-exactly
    tx = w // 8
    return [
        [(salt * 7 + ((y // 8) * tx + x // 8) * 13) % 256 for x in range(w)]
        for y in range(h)
    ]


def _make_ppm(rows) -> bytes:
    h, w = len(rows), len(rows[0])
    body = bytes(c for row in rows for px in row for c in px)
    return f"P6\n{w} {h}\n255\n".encode() + body


def test_jpeg_sniffed():
    buf = encode_jpeg(_gray_tiles(16, 8), gray=True, quant_luma=8)
    assert multimodal.sniff_format(buf) == "jpeg"


def test_gray_tiles_bit_exact_roundtrip():
    for salt in (0, 1, 5):
        rows = _gray_tiles(32, 16, salt)
        w, h, pixel, raster = parse_jpeg(
            encode_jpeg(rows, gray=True, quant_luma=8)
        )
        assert (w, h) == (32, 16)
        assert list(raster) == [v for row in rows for v in row]


def test_gray_features_match_ppm_path():
    # identical exactly-reconstructed pixels ⇒ identical stats + phash
    # via a completely different container/parse path
    rows = _gray_tiles(24, 16, salt=3)
    rgb = [[(v, v, v) for v in row] for row in rows]
    jpeg_feats = multimodal.decode_image(
        encode_jpeg(rows, gray=True, quant_luma=8), fake=False
    )
    ppm_feats = multimodal.decode_image(_make_ppm(rgb), fake=False)
    # raster widths differ (1 byte/px gray vs 3 bytes/px RGB) so byte
    # counts diverge by design; everything pixel-derived must agree
    assert jpeg_feats["width"] == ppm_feats["width"]
    assert jpeg_feats["height"] == ppm_feats["height"]
    assert jpeg_feats["phash"] == ppm_feats["phash"]
    assert jpeg_feats["byte_mean"] == ppm_feats["byte_mean"]  # r=g=b


def test_rgb_gradient_bounded_error():
    w, h = 16, 16
    rows = [
        [(x * 8 + 60, y * 8 + 60, (x + y) * 4 + 80) for x in range(w)]
        for y in range(h)
    ]
    pw, ph, pixel, raster = parse_jpeg(encode_jpeg(rows))
    assert (pw, ph) == (w, h)
    errs = [
        abs(pixel(x, y)[c] - rows[y][x][c])
        for y in range(h)
        for x in range(w)
        for c in range(3)
    ]
    assert max(errs) <= 12  # Annex K quantization on a smooth ramp
    assert sum(errs) / len(errs) < 4


def test_non_multiple_of_8_dims():
    # 13×10: right/bottom blocks are edge-padded at encode, cropped at
    # decode — dims and the interior must survive
    rows = [[(y * 13 + x) % 200 for x in range(13)] for y in range(10)]
    buf = encode_jpeg(rows, gray=True, quant_luma=1)
    w, h, pixel, raster = parse_jpeg(buf)
    assert (w, h) == (13, 10)
    assert len(raster) == 13 * 10
    # quant step 1 keeps a smooth ramp near-lossless
    errs = [abs(raster[y * 13 + x] - rows[y][x]) for y in range(10) for x in range(13)]
    assert max(errs) <= 2


def test_rejects_non_baseline_and_garbage():
    import pytest

    buf = encode_jpeg([[(8, 16, 24)] * 16] * 16)
    progressive = buf.replace(b"\xff\xc0", b"\xff\xc2", 1)
    i = buf.find(b"\xff\xc0")
    subsampled = bytearray(buf)
    subsampled[i + 4 + 7] = 0x22
    # truncation may surface as ValueError (inside the scan) or
    # IndexError (inside a segment header) — both are in the
    # decode_image dirty-payload set, so tiering behaves the same
    for bad in (b"nope", buf[:-20], progressive, bytes(subsampled)):
        with pytest.raises((ValueError, IndexError)):
            parse_jpeg(bad)


def test_dirty_jpeg_tiering():
    # sniffs as jpeg, fails to parse → fake=None falls back to the
    # deterministic stand-in; fake=False raises
    import pytest

    dirty = b"\xff\xd8\xff\xc2" + b"\x00\x10" + b"\x01" * 64
    feats = multimodal.decode_image(dirty, fake=None)
    assert feats["n_bytes"] == len(dirty)
    with pytest.raises((ValueError, NotImplementedError)):
        multimodal.decode_image(dirty, fake=False)


def test_decoder_reads_tables_from_stream():
    # quant tables travel in DQT: a different flat step changes the
    # payload but the DC-only reconstruction stays exact for steps
    # dividing 8*(v-128) — proves the decoder uses the file's tables,
    # not constants shared with the encoder
    rows = _gray_tiles(16, 16, salt=2)
    for step in (1, 2, 4, 8):
        w, h, pixel, raster = parse_jpeg(
            encode_jpeg(rows, gray=True, quant_luma=step)
        )
        assert list(raster) == [v for row in rows for v in row], f"step={step}"


# --- real resize through the codec tier -------------------------------


def test_resize_pixels_exact_box_average():
    from clickhouse_realtime_analytics_demo_spark.operators.multimodal import (
        _parse_png,
        _resize_pixels,
    )

    # 4×4 → 2×2: each output pixel is the exact mean of one 2×2 box
    rows = [
        [(0, 0, 0), (4, 8, 12), (100, 100, 100), (104, 108, 112)],
        [(8, 4, 0), (4, 4, 4), (96, 96, 96), (100, 100, 92)],
        [(200, 0, 0), (0, 200, 0), (40, 40, 40), (40, 40, 40)],
        [(0, 0, 200), (200, 200, 200), (40, 40, 40), (40, 40, 40)],
    ]
    buf = _resize_pixels(_make_ppm(rows), 2, 2)
    w, h, pixel, raster = _parse_png(buf)
    assert (w, h) == (2, 2)
    assert pixel(0, 0) == (4, 4, 4)
    assert pixel(1, 0) == (100, 101, 100)
    assert pixel(0, 1) == (100, 100, 100)
    assert pixel(1, 1) == (40, 40, 40)


def test_resize_jpeg_payload_constant_exact():
    # constant-tile JPEG → any resize of a constant image is the same
    # constant, end to end through parse_jpeg + encode_png
    from clickhouse_realtime_analytics_demo_spark.operators.multimodal import (
        _parse_png,
        _resize_pixels,
    )

    rows = [[77] * 16 for _ in range(16)]
    buf = _resize_pixels(
        encode_jpeg(rows, gray=True, quant_luma=8), 5, 3
    )
    w, h, pixel, _ = _parse_png(buf)
    assert (w, h) == (5, 3)
    assert all(pixel(x, y) == (77, 77, 77) for y in range(3) for x in range(5))


def test_resize_images_tiering(spark):
    import pandas as pd  # noqa: F401  (mapInPandas dependency)

    from clickhouse_realtime_analytics_demo_spark.operators.multimodal import (
        _parse_png,
        resize_images,
    )

    ppm = _make_ppm([[(10, 20, 30)] * 8] * 8)
    media = spark.createDataFrame(
        [(1, bytearray(ppm)), (2, bytearray(b"not an image"))],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in resize_images(media, 4, 4).collect()}
    # real path: payload is a PNG of the right dims with the constant
    w, h, pixel, _ = _parse_png(bytes(out[1]["payload"]))
    assert (w, h) == (4, 4) and pixel(0, 0) == (10, 20, 30)
    assert out[1]["meta"]["format"] == "png"
    # dirty payload: deterministic stand-in, tagged raw
    assert out[2]["meta"]["format"] == "raw"
    assert len(out[2]["payload"]) == 32  # sha256 digest

    import pytest

    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises(PythonException):
        resize_images(media, 4, 4, fake=False).collect()


def test_empty_image_rejected():
    import pytest

    with pytest.raises(ValueError, match="empty image"):
        encode_jpeg([])
    with pytest.raises(ValueError, match="empty image"):
        encode_jpeg([[]])
