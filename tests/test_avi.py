"""AVI video tier (r9): container write→parse roundtrips for both
pure-byte codecs (DIB uncompressed, MJPG via the baseline-JPEG
codec), real frame sampling semantics, and the dirty-payload tier."""

from __future__ import annotations

import pytest

from clickhouse_realtime_analytics_demo_spark.operators import multimodal
from clickhouse_realtime_analytics_demo_spark.operators.multimodal import (
    _decode_avi_frame,
    _parse_avi,
    _parse_png,
    encode_avi,
)


def _gradient(k, w=10, h=6):
    return [
        [((k * 10 + x) % 256, (k * 20 + y) % 256, (x + y) % 256) for x in range(w)]
        for y in range(h)
    ]


def test_dib_roundtrip_bit_exact():
    frames = [_gradient(k) for k in range(4)]
    avi = encode_avi(frames, fps=5, codec="DIB ")
    assert multimodal.sniff_format(avi) == "avi"
    p = _parse_avi(avi)
    assert (p["w"], p["h"], p["n_frames"], p["us_per_frame"]) == (10, 6, 4, 200000)
    for k in range(4):
        w, h, pixel, _ = _decode_avi_frame(p, k)
        assert all(
            pixel(x, y) == frames[k][y][x] for y in range(h) for x in range(w)
        )


def test_mjpg_constant_frames_bit_exact():
    # constant frames are JPEG's DC-only lossless corner
    vals = (0, 13, 128, 255)
    frames = [[[(v, v, v) for _ in range(12)] for _ in range(7)] for v in vals]
    p = _parse_avi(encode_avi(frames, fps=4, codec="MJPG"))
    assert p["handler"] == b"MJPG"
    for i, v in enumerate(vals):
        w, h, pixel, raster = _decode_avi_frame(p, i)
        assert (w, h) == (12, 7)
        assert set(raster) == {v}


def test_sampler_frame_selection():
    # 5 fps (200 ms/frame), 4 frames: every_ms=400 takes frames 0 and 2;
    # every_ms=100 samples each frame twice
    frames = [[[(v, v, v) for _ in range(8)] for _ in range(8)] for v in (1, 2, 3, 4)]
    avi = encode_avi(frames, fps=5, codec="DIB ")
    p = _parse_avi(avi)
    dur = p["n_frames"] * p["us_per_frame"] // 1000

    def picks(every_ms):
        return [
            min(i * every_ms * 1000 // p["us_per_frame"], p["n_frames"] - 1)
            for i in range(max(1, dur // every_ms))
        ]

    assert picks(400) == [0, 2]
    assert picks(100) == [0, 0, 1, 1, 2, 2, 3, 3]
    assert picks(200) == [0, 1, 2, 3]


def test_sample_frames_real_tier(spark):
    docs = spark.createDataFrame([(6,), (7,)], "doc_id bigint")
    media = multimodal.synthesize_avi_media(docs)
    rows = multimodal.sample_frames(media, every_ms=200).collect()
    # doc 6: 2+6%7=8 frames (DIB); doc 7: 2 frames (MJPG)
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id[6]) == 8 and len(by_id[7]) == 2
    # sampled payloads are REAL PNGs carrying the closed-form constant
    for r in by_id[7]:
        w, h, pixel, raster = _parse_png(bytes(r["frame_payload"]))
        v = (7 * 7 + r["frame_index"] * 13) % 256
        assert (w, h) == (8 + 7 % 5, 5 + 7 % 4)
        assert set(raster) == {v}


def test_dirty_and_unsupported_tiering(spark):
    frames = [_gradient(0)]
    dirty = encode_avi(frames, fps=5)[:40]  # truncated mid-header
    assert multimodal.sniff_format(dirty) == "avi"
    docs = spark.createDataFrame(
        [(1, dirty), (2, b"not a video")],
        "media_id bigint, payload binary",
    ).selectExpr(
        "media_id",
        "payload",
        "named_struct('media_type', 'video', 'format', 'avi', 'width', 1, "
        "'height', 1, 'duration_ms', CAST(400 AS BIGINT), 'size_bytes', 1) AS meta",
    )
    # fake=None: both fall through to the digest stand-in (2 frames each)
    rows = multimodal.sample_frames(docs, every_ms=200).collect()
    assert len(rows) == 4
    assert all(len(bytes(r["frame_payload"])) == 32 for r in rows)  # sha256

    with pytest.raises(Exception):
        multimodal.sample_frames(docs, every_ms=200, fake=False).collect()


def test_unsupported_codec_rejected():
    with pytest.raises(ValueError, match="codec"):
        encode_avi([_gradient(0)], codec="H264")
    avi = bytearray(encode_avi([_gradient(0)], codec="MJPG"))
    i = avi.find(b"vidsMJPG")
    avi[i + 4 : i + 8] = b"H264"
    p = _parse_avi(bytes(avi))
    with pytest.raises(ValueError, match="unsupported AVI codec"):
        _decode_avi_frame(p, 0)


def test_multistream_avi_collects_only_first_vids_stream():
    """ADVICE r9: an AVI with an audio stream declared BEFORE the video
    stream numbers the video chunks '01db'; the parser must attribute
    only that stream's chunks to the frame list — audio '00wb' chunks
    (and a hypothetical second video '02db') must not interleave."""
    import struct

    frames = [_gradient(k) for k in range(3)]
    single = encode_avi(frames, fps=5, codec="DIB ")
    base = _parse_avi(single)

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    # rebuild: stream 0 = audio (auds), stream 1 = the video stream
    avih = struct.pack(
        "<14I", base["us_per_frame"], 0, 0, 0x10, 3, 0, 2, 0,
        base["w"], base["h"], 0, 0, 0, 0,
    )
    auds_strh = b"auds" + b"\x00" * 44
    auds_strf = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    vids_strh = (
        b"vids" + b"DIB "
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 5, 0, 3, 0, 0, 0)
        + struct.pack("<4H", 0, 0, base["w"], base["h"])
    )
    vids_strf = struct.pack(
        "<IiiHH4sIiiII", 40, base["w"], base["h"], 1, 24,
        b"\x00\x00\x00\x00", 0, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", auds_strh) + chunk(b"strf", auds_strf))
        + lst(b"strl", chunk(b"strh", vids_strh) + chunk(b"strf", vids_strf)),
    )
    movi_body = b""
    for f in base["frames"]:
        movi_body += chunk(b"00wb", b"\x80" * 16)  # audio: must be ignored
        movi_body += chunk(b"01db", f)  # the real video stream
        movi_body += chunk(b"02db", b"\xff" * len(f))  # foreign video-like
    body = b"AVI " + hdrl + lst(b"movi", movi_body)
    multi = b"RIFF" + struct.pack("<I", len(body)) + body

    p = _parse_avi(multi)
    assert p["n_frames"] == 3 and p["handler"] == b"DIB "
    assert p["frames"] == base["frames"]  # exactly the vids chunks
    for k in range(3):
        w, h, pixel, _ = _decode_avi_frame(p, k)
        assert pixel(0, 0) == frames[k][0][0]
        assert pixel(w - 1, h - 1) == frames[k][h - 1][w - 1]
