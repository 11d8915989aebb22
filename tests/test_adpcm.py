"""IMA-ADPCM codec (r9, VERDICT #7 — the compressed-audio tier):
decoder pinned against an independent spec transcription, encoder
tracking bound, WAV header roundtrip, and the dirty-payload tier."""

from __future__ import annotations

import struct

import pytest

from clickhouse_realtime_analytics_demo_spark.operators import multimodal
from clickhouse_realtime_analytics_demo_spark.operators.multimodal import (
    _IMA_STEPS,
    encode_wav_ima,
    ima_adpcm_decode,
    ima_adpcm_encode,
)

# ------------------------- independent reference decoder (spec, 1992)

_REF_INDEX = {0: -1, 1: -1, 2: -1, 3: -1, 4: 2, 5: 4, 6: 6, 7: 8}


def reference_decode(data: bytes, block_align: int) -> list[int]:
    out = []
    for base in range(0, len(data) - block_align + 1, block_align):
        pred = struct.unpack_from("<h", data, base)[0]
        index = data[base + 2]
        out.append(pred)
        nibbles = []
        for b in data[base + 4 : base + block_align]:
            nibbles.extend((b & 0xF, b >> 4))
        for code in nibbles:
            step = _IMA_STEPS[index]
            # spec form: diff = (2*mag + 1) * step / 8, via shifts
            diff = step >> 3
            if code & 4:
                diff += step
            if code & 2:
                diff += step >> 1
            if code & 1:
                diff += step >> 2
            pred = pred - diff if code & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            index = max(0, min(88, index + _REF_INDEX[code & 7]))
            out.append(pred)
    return out


def _wave(n, seed=0):
    return [((seed * 31 + i * 7) % 2048) - 1024 for i in range(n)]


def test_decoder_matches_reference_on_arbitrary_streams():
    # any nibble stream is a valid ADPCM stream (index byte clamped
    # ≤ 88): pseudo-random blocks must decode identically under the
    # operator decoder and the independent transcription
    import hashlib

    for seed in range(4):
        raw = bytearray()
        for blk in range(3):
            raw += struct.pack("<hBB", (seed * 9177 + blk * 313) % 30000 - 15000,
                               (seed * 17 + blk * 29) % 89, 0)
            h = hashlib.sha256(f"{seed}:{blk}".encode()).digest()
            raw += (h * 8)[: 252]
        got = ima_adpcm_decode(bytes(raw), 256)
        assert got == reference_decode(bytes(raw), 256)
        assert len(got) == 3 * 505


def test_encode_decode_roundtrip_tracks_signal():
    # a genuine triangle (slope ±10/sample, NO discontinuities — the
    # sawtooth _wave's mod-wrap jumps are exactly what ADPCM cannot
    # track): once the step size adapts, reconstruction stays within a
    # few steps of the slope's scale
    samples = [(abs(i % 400 - 200) - 100) * 10 for i in range(505 * 4)]
    decoded = ima_adpcm_decode(ima_adpcm_encode(samples), 256)
    assert len(decoded) == len(samples)
    # block headers carry the exact sample
    for b in range(4):
        assert decoded[b * 505] == samples[b * 505]
    err = max(abs(a - b) for a, b in zip(decoded, samples))
    assert err <= 4 * 16  # steps near the slope's scale (~10-16)


def test_wav_header_roundtrip_metadata():
    samples = _wave(505 * 3, seed=1)
    payload = encode_wav_ima(samples, rate=8000)
    assert multimodal.sniff_format(payload) == "wav"
    meta = multimodal.decode_audio(payload, fake=False)
    assert meta == {
        "format": "wav",
        "channels": 1,
        "sample_rate": 8000,
        "bits_per_sample": 4,
        "duration_ms": 505 * 3 * 1000 // 8000,
        "n_bytes": 3 * 256,
    }


def test_partial_block_samples_rejected():
    with pytest.raises(ValueError, match="multiple of 505"):
        ima_adpcm_encode(_wave(500))


def test_dirty_adpcm_tiering():
    # truncated mid-header: fake=None falls through to the stand-in,
    # fake=False raises — the media_wav_stats dirty-payload contract
    dirty = encode_wav_ima(_wave(505))[:30]
    out = multimodal.decode_audio(dirty, fake=None)
    assert out["format"] == "fake"
    with pytest.raises(Exception):
        multimodal.decode_audio(dirty, fake=False)
