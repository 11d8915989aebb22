"""Pure-Python baseline JPEG (ITU-T T.81 sequential DCT) — the
image-format twin of the PNG/GIF codecs in ``operators.multimodal``,
closing the last image entry in the compressed-format tier without
any image library (the container ships neither PIL nor libjpeg).

Scope (honest subset, everything else raises ValueError so the
auto-tier in ``decode_image`` falls back to the stand-in):

- ``encode_jpeg``: 8-bit grayscale (1 component) or 4:4:4 RGB
  (3 components, no chroma subsampling), standard Annex K Huffman
  tables, caller-selectable quantization tables.
- ``parse_jpeg``: baseline SOF0 only, 8-bit precision, 1 or 3
  components with 1×1 sampling factors, no restart intervals.
  Progressive (SOF2), subsampled, arithmetic-coded and 12-bit
  streams are rejected, not mis-decoded. Huffman and quantization
  tables are read from the file's own DQT/DHT segments — the
  decoder shares no table constants with the encoder, so a
  roundtrip exercises marker layout, canonical-code construction,
  bit (un)stuffing, DC prediction and the run-length AC form on
  both sides independently.

Exact-roundtrip corner used by the ``media_jpeg_stats`` oracle: an
image whose 8×8-aligned tiles are each a constant gray value v is
DC-only in the DCT domain (every AC basis row sums to zero over a
constant block), and with a quantization step that divides the DC
scale the quantized value reconstructs v bit-exactly — the same
closed-form-identity trick as the PNG gradient, but through a LOSSY
codec's lossless corner.

Reference parity: the reference's media story treats images as
opaque payloads + metadata (clickhouse-realtime-analytics-demo has
no decoder at all); this module exists for the Spark-side curation
operators (SURVEY §2 multimodal) the way PIL would in a full deploy.
"""

from __future__ import annotations

import math
import struct

__all__ = ["encode_jpeg", "parse_jpeg"]

# Zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient.
_ZZ = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# Annex K quantization tables (the spec's example luminance /
# chrominance tables, in zigzag order they are usually shown — here
# row-major for direct (u,v) indexing).
_Q_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_Q_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K Huffman table specs: (BITS[1..16], HUFFVAL). The encoder
# writes these into DHT; the decoder never sees these constants (it
# rebuilds from the stream), so a transcription slip cannot be
# self-masking — module import asserts the counts line up instead.
_DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
for _bits, _vals in (_DC_LUMA_SPEC, _DC_CHROMA_SPEC, _AC_LUMA_SPEC, _AC_CHROMA_SPEC):
    assert sum(_bits) == len(_vals), "Huffman spec transcription error"

# Separable DCT basis: _COS[u][x] = cos((2x+1)uπ/16), C(u) folded in
# at use sites.
_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per the canonical algorithm (C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _category(v: int) -> int:
    """Bit category: smallest s with |v| < 2^s."""
    return v.bit_length() if v >= 0 else (-v).bit_length()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            self.put((1 << (8 - self._n)) - 1, 8 - self._n)  # pad with 1s


def _fdct_quant(block: list[int], q: list[int]) -> list[int]:
    """8×8 forward DCT + quantization → 64 coefficients in zigzag
    order. Direct separable float DCT — fixture-scale images only,
    exactly like the PNG/GIF pixel walks (MB-scale assets take the
    PIL tier)."""
    # rows then columns
    tmp = [0.0] * 64
    for y in range(8):
        row = block[y * 8 : y * 8 + 8]
        for u in range(8):
            cu = _COS[u]
            tmp[y * 8 + u] = sum(row[x] * cu[x] for x in range(8))
    coef = [0.0] * 64
    for u in range(8):
        for v in range(8):
            cv = _COS[v]
            s = sum(tmp[y * 8 + u] * cv[y] for y in range(8))
            coef[v * 8 + u] = s * _C[u] * _C[v] / 4.0
    out = []
    for k, (r, c) in enumerate(_ZZ):
        val = coef[r * 8 + c] / q[r * 8 + c]
        out.append(int(val + 0.5) if val >= 0 else -int(-val + 0.5))
    return out


def _encode_block(
    zz: list[int],
    prev_dc: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    w: _BitWriter,
) -> int:
    diff = zz[0] - prev_dc
    s = _category(diff)
    code, length = dc_codes[s]
    w.put(code, length)
    if s:
        w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            w.put(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        w.put(code, length)
        w.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        w.put(code, length)
    return zz[0]


def encode_jpeg(
    rows: list[list],
    *,
    gray: bool = False,
    quant_luma: list[int] | int | None = None,
    quant_chroma: list[int] | int | None = None,
) -> bytes:
    """Baseline sequential JPEG. ``rows[y][x]`` is an int (``gray``)
    or an (r, g, b) tuple (4:4:4, no subsampling). ``quant_*`` is a
    64-entry row-major table, a single flat step, or None for the
    Annex K tables."""

    def q_table(q, default):
        if q is None:
            return list(default)
        if isinstance(q, int):
            return [q] * 64
        if len(q) != 64:
            raise ValueError("quant table must have 64 entries")
        return list(q)

    ql = q_table(quant_luma, _Q_LUMA)
    qc = q_table(quant_chroma, _Q_CHROMA)
    if not rows or not rows[0]:
        raise ValueError("empty image")
    h = len(rows)
    w = len(rows[0])

    # Component planes, level-shifted; pad to 8×8 by edge replication.
    if gray:
        planes = [[[int(rows[min(y, h - 1)][min(x, w - 1)]) - 128
                    for x in range((w + 7) // 8 * 8)]
                   for y in range((h + 7) // 8 * 8)]]
    else:
        yp, cbp, crp = [], [], []
        for y in range((h + 7) // 8 * 8):
            ry, rcb, rcr = [], [], []
            for x in range((w + 7) // 8 * 8):
                r, g, b = rows[min(y, h - 1)][min(x, w - 1)]
                yy = 0.299 * r + 0.587 * g + 0.114 * b
                cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
                cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
                ry.append(min(255, max(0, int(yy + 0.5))) - 128)
                rcb.append(min(255, max(0, int(cb + 0.5))) - 128)
                rcr.append(min(255, max(0, int(cr + 0.5))) - 128)
            yp.append(ry)
            cbp.append(rcb)
            crp.append(rcr)
        planes = [yp, cbp, crp]

    dc_l = _canonical_codes(*_DC_LUMA_SPEC)
    ac_l = _canonical_codes(*_AC_LUMA_SPEC)
    dc_c = _canonical_codes(*_DC_CHROMA_SPEC)
    ac_c = _canonical_codes(*_AC_CHROMA_SPEC)

    bw = _BitWriter()
    prev = [0] * len(planes)
    tables = [(ql, dc_l, ac_l)] + [(qc, dc_c, ac_c)] * (len(planes) - 1)
    for by in range(0, len(planes[0]), 8):
        for bx in range(0, len(planes[0][0]), 8):
            for ci, plane in enumerate(planes):
                block = [plane[by + yy][bx + xx] for yy in range(8) for xx in range(8)]
                q, dct, act = tables[ci]
                zz = _fdct_quant(block, q)
                prev[ci] = _encode_block(zz, prev[ci], dct, act, bw)
    bw.flush()

    def marker(m: int, payload: bytes) -> bytes:
        return struct.pack(">HH", m, len(payload) + 2) + payload

    def dqt(tid: int, q: list[int]) -> bytes:
        return marker(0xFFDB, bytes([tid]) + bytes(q[r * 8 + c] for r, c in _ZZ))

    def dht(cls: int, tid: int, spec) -> bytes:
        bits, vals = spec
        return marker(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    sos = bytes([ncomp])
    for ci in range(ncomp):
        qid = 0 if ci == 0 else 1
        sof += bytes([ci + 1, 0x11, qid])
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])  # full spectral range, no successive approx

    out = bytearray(b"\xff\xd8")  # SOI
    out += marker(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, ql)
    if ncomp == 3:
        out += dqt(1, qc)
    out += marker(0xFFC0, sof)  # SOF0 baseline
    out += dht(0, 0, _DC_LUMA_SPEC)
    out += dht(1, 0, _AC_LUMA_SPEC)
    if ncomp == 3:
        out += dht(0, 1, _DC_CHROMA_SPEC)
        out += dht(1, 1, _AC_CHROMA_SPEC)
    out += marker(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00
    unstuffing; raises ValueError on markers/EOF inside a scan."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.buf):
                raise ValueError("JPEG scan truncated")
            b = self.buf[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.buf):
                    raise ValueError("JPEG scan truncated at 0xFF")
                nxt = self.buf[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} inside scan")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _build_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value map for canonical codes."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_huff(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code in JPEG scan")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _idct(zz_deq: list[float]) -> list[int]:
    """Inverse DCT of a row-major dequantized block → 64 clamped
    pixel bytes (level shift applied)."""
    tmp = [0.0] * 64
    for v in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                s += _C[u] * zz_deq[v * 8 + u] * _COS[u][x]
            tmp[v * 8 + x] = s
    out = [0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for v in range(8):
                s += _C[v] * tmp[v * 8 + x] * _COS[v][y]
            p = s / 4.0 + 128.0
            out[y * 8 + x] = min(255, max(0, int(p + 0.5)))
    return out


def parse_jpeg(payload: bytes):
    """Decode a baseline JPEG → ``(w, h, pixel, raster)`` matching the
    BMP/PPM/PNG/GIF parser contract (``pixel(x, y) -> (r, g, b)``;
    ``raster`` = the decoded component bytes, the honest image content
    for byte stats)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qid)
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}, got {payload[pos]:#x}")
        m = payload[pos + 1]
        if m == 0xD9:  # EOI before SOS
            raise ValueError("JPEG has no scan")
        seglen = struct.unpack_from(">H", payload, pos + 2)[0]
        seg = payload[pos + 4 : pos + 2 + seglen]
        if m == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                zz = list(seg[i + 1 : i + 65])
                tab = [0] * 64
                for k, (r, c) in enumerate(_ZZ):
                    tab[r * 8 + c] = zz[k]
                qtables[tid] = tab
                i += 65
        elif m == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                htables[(cls, tid)] = _build_decode(bits, vals)
                i += 17 + n
        elif m == 0xC0:  # SOF0 baseline
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG unsupported")
            ih, iw = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            if nc not in (1, 3):
                raise ValueError(f"{nc}-component JPEG unsupported")
            comps = []
            for ci in range(nc):
                cid, samp, qid = seg[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError("chroma-subsampled JPEG unsupported (4:4:4 only)")
                comps.append((cid, samp, qid))
            sof = (iw, ih, nc)
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG (SOF marker 0xFF{m:02X}) unsupported")
        elif m == 0xDD:  # DRI
            if struct.unpack_from(">H", seg, 0)[0] != 0:
                raise ValueError("restart intervals unsupported")
        elif m == 0xDA:  # SOS — entropy-coded data follows
            if sof is None:
                raise ValueError("SOS before SOF0")
            iw, ih, nc = sof
            ns = seg[0]
            if ns != nc:
                raise ValueError("partial-scan JPEG unsupported")
            sel = {}
            for ci in range(ns):
                cid, tids = seg[1 + 2 * ci], seg[2 + 2 * ci]
                sel[cid] = (tids >> 4, tids & 0x0F)
            if any(cid not in sel for cid, _s, _q in comps):
                raise ValueError("SOS component ids do not match SOF0")
            r = _BitReader(payload, pos + 2 + seglen)
            bw_, bh_ = (iw + 7) // 8, (ih + 7) // 8
            planes = [[[0] * (bw_ * 8) for _ in range(bh_ * 8)] for _ in range(nc)]
            prev = [0] * nc
            for by in range(bh_):
                for bx in range(bw_):
                    for ci, (cid, _s, qid) in enumerate(comps):
                        dct = htables.get((0, sel[cid][0]))
                        act = htables.get((1, sel[cid][1]))
                        q = qtables.get(qid)
                        if dct is None or act is None or q is None:
                            raise ValueError("scan references missing table")
                        zz = [0] * 64
                        s = _read_huff(r, dct)
                        diff = _extend(r.bits(s), s) if s else 0
                        prev[ci] += diff
                        zz[0] = prev[ci]
                        k = 1
                        while k < 64:
                            rs = _read_huff(r, act)
                            rl, sz = rs >> 4, rs & 0x0F
                            if sz == 0:
                                if rl == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += rl
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            zz[k] = _extend(r.bits(sz), sz)
                            k += 1
                        deq = [0.0] * 64
                        for k2, (rr, cc) in enumerate(_ZZ):
                            deq[rr * 8 + cc] = zz[k2] * q[rr * 8 + cc]
                        px = _idct(deq)
                        plane = planes[ci]
                        for yy in range(8):
                            orow = plane[by * 8 + yy]
                            for xx in range(8):
                                orow[bx * 8 + xx] = px[yy * 8 + xx]
            if nc == 1:
                raster = bytes(
                    planes[0][y][x] for y in range(ih) for x in range(iw)
                )

                def pixel(x: int, y: int) -> tuple[int, int, int]:
                    v = planes[0][y][x]
                    return (v, v, v)

            else:
                buf = bytearray()
                for y in range(ih):
                    yrow, cbrow, crrow = planes[0][y], planes[1][y], planes[2][y]
                    for x in range(iw):
                        yy, cb, cr = yrow[x], cbrow[x] - 128, crrow[x] - 128
                        buf.append(min(255, max(0, int(yy + 1.402 * cr + 0.5))))
                        buf.append(
                            min(255, max(0, int(yy - 0.344136 * cb - 0.714136 * cr + 0.5)))
                        )
                        buf.append(min(255, max(0, int(yy + 1.772 * cb + 0.5))))
                raster = bytes(buf)

                def pixel(x: int, y: int) -> tuple[int, int, int]:
                    i = (y * iw + x) * 3
                    return (raster[i], raster[i + 1], raster[i + 2])

            return iw, ih, pixel, raster
        pos += 2 + seglen
    raise ValueError("JPEG truncated before SOS")
