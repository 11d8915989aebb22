"""Pure-Python GIF codec: LZW roundtrip (width bumps, KwKwK, 12-bit
reset), interlace, feature parity with the BMP path on identical
pixels, dirty-payload fallback tiering."""

from __future__ import annotations

import pytest

from clickhouse_realtime_analytics_demo_spark.operators import multimodal
from tests.test_multimodal import _PIXELS, make_bmp


def _noise_pixels(w: int, h: int, colors: int = 256):
    # deterministic pseudo-noise (LCG) — enough distinct patterns to
    # push the LZW dictionary past 4096 codes and force the mid-stream
    # CLEAR/reset path when the image is large
    out, state = [], 12345
    for y in range(h):
        row = []
        for x in range(w):
            state = (state * 1103515245 + 12345) & 0x7FFFFFFF
            v = state % colors
            row.append((v, (v * 7) % 256, (v * 13) % 256))
        out.append(row)
    return out


def test_gif_sniffed():
    assert multimodal.sniff_format(multimodal.encode_gif(_PIXELS)) == "gif"
    assert multimodal.sniff_format(b"GIF87a" + b"\x00" * 16) == "gif"


def test_gif_matches_bmp_features():
    bmp = multimodal.decode_image(make_bmp(_PIXELS), fake=False)
    gif = multimodal.decode_image(multimodal.encode_gif(_PIXELS), fake=False)
    assert gif == bmp  # identical pixels ⇒ identical stats and phash


def test_interlaced_gif_matches_plain():
    px = _noise_pixels(24, 17, colors=32)  # odd height exercises all 4 passes
    plain = multimodal.decode_image(multimodal.encode_gif(px), fake=False)
    inter = multimodal.decode_image(
        multimodal.encode_gif(px, interlaced=True), fake=False
    )
    assert plain == inter


def test_lzw_dictionary_overflow_roundtrip():
    px = _noise_pixels(100, 100)  # ~10k near-random indices: crosses
    payload = multimodal.encode_gif(px)  # the 12-bit cap ⇒ CLEAR+reset
    feats = multimodal.decode_image(payload, fake=False)
    flat = bytes(v for row in px for p in row for v in p)
    assert feats["width"] == 100 and feats["height"] == 100
    assert feats["n_bytes"] == len(flat)
    assert feats["byte_mean"] == sum(flat) / len(flat)


def test_palette_overflow_rejected():
    px = [[(x % 256, y, (x * y) % 256) for x in range(32)] for y in range(32)]
    with pytest.raises(ValueError, match="palette overflow"):
        multimodal.encode_gif(px)


def test_dirty_gif_tiering():
    dirty = multimodal.encode_gif(_PIXELS)[:20]  # truncated mid-header
    with pytest.raises(ValueError):
        multimodal.decode_image(dirty, fake=False)
    # auto tier: falls through to the deterministic stand-in
    feats = multimodal.decode_image(dirty, fake=None)
    assert feats["n_bytes"] == len(dirty)
