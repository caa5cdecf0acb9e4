"""Baseline JPEG (JFIF) codec — pure Python/numpy, written to the
public ITU-T T.81 spec (baseline sequential DCT, Annex F/K) and the
JFIF 1.02 color conventions. No imaging library: this closes the last
multimodal dispatch seam (stages/multimodal._decode_rgb), the reference
analog being the media bundle's ImageIO-backed processors
(nifi-media-bundle/.../ResizeImage.java reads jpeg via ImageIO).

Scope (exactly what the fixtures exercise, loudly rejected otherwise):
- decode: baseline DCT (SOF0), 8-bit, 1 or 3 components, 4:4:4 and
  4:2:0 subsampling, restart intervals (DRI/RSTn), byte stuffing.
- encode: the same subset with the Annex K example quantization +
  Huffman tables (quality-scaled per the libjpeg 5000/q | 200-2q
  convention — also public).

Determinism contract: every lossy rounding in BOTH directions is
``floor(x + 0.5)`` and the IDCT is the float64 orthonormal matrix
product — so decoded pixels are a pure function of the payload bytes,
reproduced exactly by the independent scalar dual in
``oracle_expected`` (which re-derives pixels from the coefficient path
WITHOUT the entropy decoder, pinning the huffman/bitstream layer).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------- constants
# zig-zag order (T.81 Figure A.6): zigzag index -> raster index
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 example quantization tables
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 example Huffman tables: (BITS[1..16], HUFFVAL)
HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal DCT-II basis: T[u, x] = C(u)/2 * cos((2x+1) u pi / 16)
_T = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _T[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _round_half_up(x: np.ndarray) -> np.ndarray:
    """floor(x + 0.5) — THE rounding for every lossy step (both codec
    directions and the scalar oracle dual)."""
    return np.floor(x + 0.5)


def scaled_qtables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex K tables scaled by the public libjpeg quality convention."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QT_LUMA, QT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# ---------------------------------------------------------- bit I/O


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing (T.81 F.1.2.3)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):  # pad with 1-bits (T.81 F.1.2.3)
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """Entropy-segment reader: un-stuffs FF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"marker 0xFF{nxt:02X} inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self):
        """Skip to the next marker byte pair (after a restart)."""
        self.acc = 0
        self.nbits = 0
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1


class _RestartMarker(Exception):
    def __init__(self, code):
        self.code = code


# ---------------------------------------------------------- huffman


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical assignment (T.81 Annex C)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """(length, code) -> value lookup, walked bit by bit."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.table = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.table[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            v = self.table.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s received bits to the signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------- color


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(_round_half_up(out), 0, 255)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------- encoder


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) -> (n, 8, 8) blocks in
    raster MCU-free order (row-major 8x8 tiling)."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _quantize_plane(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """plane -> (n_blocks, 64) quantized zigzag coefficients."""
    blocks = _blocks_of(plane.astype(np.float64) - 128.0)
    coeff = np.einsum("ux,nxy,vy->nuv", _T, blocks, _T)
    q = _round_half_up(coeff / qt.reshape(8, 8)).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    H = -(-h // mh) * mh
    W = -(-w // mw) * mw
    return np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")


def _downsample2(plane: np.ndarray) -> np.ndarray:
    """2x2 mean, round-half-up (even dims required — pad first)."""
    h, w = plane.shape
    s = plane.reshape(h // 2, 2, w // 2, 2).astype(np.float64).mean(axis=(1, 3))
    return _round_half_up(s)


def component_coefficients(
    rgb: np.ndarray, quality: int = 75, subsample: str = "4:2:0"
) -> tuple[list[np.ndarray], tuple[int, int]]:
    """The shared forward path: RGB -> per-component quantized zigzag
    coefficient arrays [(nY,64), (nCb,64), (nCr,64)] in MCU scan order,
    plus the luma sampling factors. The encoder huffman-codes exactly
    these; the oracle dual reconstructs pixels from exactly these."""
    qt_l, qt_c = scaled_qtables(quality)
    ycc = rgb_to_ycbcr(rgb)
    hs, vs = (2, 2) if subsample == "4:2:0" else (1, 1)
    y = _pad_edge(ycc[..., 0], 8 * vs, 8 * hs)
    cb = _pad_edge(ycc[..., 1], 8 * vs, 8 * hs)
    cr = _pad_edge(ycc[..., 2], 8 * vs, 8 * hs)
    if subsample == "4:2:0":
        cb, cr = _downsample2(cb), _downsample2(cr)
    yq = _quantize_plane(y, qt_l)
    cbq = _quantize_plane(cb, qt_c)
    crq = _quantize_plane(cr, qt_c)
    if subsample == "4:2:0":
        # reorder luma blocks into MCU order: per 16x16 MCU the four
        # luma blocks TL, TR, BL, BR (T.81 A.2.3 interleaving)
        H, W = y.shape
        bw = W // 8
        mcu_rows, mcu_cols = H // 16, W // 16
        idx = []
        for mr in range(mcu_rows):
            for mc in range(mcu_cols):
                r0, c0 = 2 * mr, 2 * mc
                idx += [r0 * bw + c0, r0 * bw + c0 + 1,
                        (r0 + 1) * bw + c0, (r0 + 1) * bw + c0 + 1]
        yq = yq[np.array(idx)]
    return [yq, cbq, crq], (hs, vs)


def encode_jpeg_baseline(
    rgb: np.ndarray, quality: int = 75, subsample: str = "4:2:0",
    restart_interval: int = 0,
) -> bytes:
    """RGB uint8 (H, W, 3) -> baseline JFIF bytes."""
    if subsample not in ("4:2:0", "4:4:4"):
        raise NotImplementedError(subsample)
    h, w = rgb.shape[:2]
    qt_l, qt_c = scaled_qtables(quality)
    comps, (hs, vs) = component_coefficients(rgb, quality, subsample)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in ((0, qt_l), (1, qt_c)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(qt[ZIGZAG[i]]) for i in range(64))
    # SOF0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, (hs << 4) | vs, 0])   # Y
    out += bytes([2, 0x11, 1])             # Cb
    out += bytes([3, 0x11, 1])             # Cr
    # DHT ×4
    for cls, tid, (bits, vals) in (
        (0, 0, HT_DC_LUMA), (1, 0, HT_AC_LUMA),
        (0, 1, HT_DC_CHROMA), (1, 1, HT_AC_CHROMA),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])

    dc_l = _canonical_codes(*HT_DC_LUMA)
    ac_l = _canonical_codes(*HT_AC_LUMA)
    dc_c = _canonical_codes(*HT_DC_CHROMA)
    ac_c = _canonical_codes(*HT_AC_CHROMA)

    bw_ = _BitWriter()
    pred = [0, 0, 0]

    def put_block(zz: np.ndarray, ci: int):
        dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        s = _category(diff)
        code, ln = dct[s]
        bw_.write(code, ln)
        if s:
            bw_.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = act[0xF0]
                bw_.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = act[(run << 4) | s]
            bw_.write(code, ln)
            bw_.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            code, ln = act[0x00]
            bw_.write(code, ln)

    n_mcus = len(comps[1])  # one chroma block pair per MCU
    luma_per_mcu = hs * vs
    rst = 0
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            bw_.flush()
            out_entropy = bytes(bw_.buf)
            out += out_entropy + bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            bw_ = _BitWriter()
            pred[:] = [0, 0, 0]
        for j in range(luma_per_mcu):
            put_block(comps[0][m * luma_per_mcu + j], 0)
        put_block(comps[1][m], 1)
        put_block(comps[2][m], 2)
    bw_.flush()
    out += bytes(bw_.buf)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------ progressive encoder

# Default successive-approximation scan script (the classic 10-scan
# shape of jpeg_simple_progression for 3 components): spectral
# selection + two successive-approximation levels for luma AC, one DC
# refinement pass. Each entry: (component indices, Ss, Se, Ah, Al).
PROGRESSIVE_SCANS = [
    ([0, 1, 2], 0, 0, 0, 1),   # DC first, point transform 1
    ([0], 1, 5, 0, 2),         # luma AC 1-5 at Al=2
    ([2], 1, 63, 0, 1),
    ([1], 1, 63, 0, 1),
    ([0], 6, 63, 0, 2),        # luma AC tail at Al=2
    ([0], 1, 63, 2, 1),        # luma AC refine 2->1
    ([0, 1, 2], 0, 0, 1, 0),   # DC refine
    ([2], 1, 63, 1, 0),
    ([1], 1, 63, 1, 0),
    ([0], 1, 63, 1, 0),        # luma AC refine 1->0
]


def encode_jpeg_progressive(
    rgb: np.ndarray,
    quality: int = 75,
    subsample: str = "4:2:0",
    scans: list | None = None,
) -> bytes:
    """RGB uint8 (H, W, 3) -> progressive JFIF bytes (SOF2, T.81
    Annex G). Quantized coefficients are IDENTICAL to the baseline
    encoder's (same forward path), only the entropy layout differs —
    so decode(progressive) must equal decode(baseline) bit-exactly,
    which is the codec's dual-verification for the progressive paths.

    EOB runs are capped at 1 (EOB0 emitted immediately): longer runs
    need EOBn symbols absent from the Annex K example Huffman tables,
    and building a two-pass optimal coder buys nothing for fixtures.
    The DECODER implements full EOB-run semantics regardless."""
    if subsample not in ("4:2:0", "4:4:4"):
        raise NotImplementedError(subsample)
    h, w = rgb.shape[:2]
    qt_l, qt_c = scaled_qtables(quality)
    scans = PROGRESSIVE_SCANS if scans is None else scans
    hs, vs = (2, 2) if subsample == "4:2:0" else (1, 1)

    # raster-order zigzag coefficients per component (NOT MCU order:
    # non-interleaved AC scans walk the component's own block raster)
    ycc = rgb_to_ycbcr(rgb)
    y = _pad_edge(ycc[..., 0], 8 * vs, 8 * hs)
    cb = _pad_edge(ycc[..., 1], 8 * vs, 8 * hs)
    cr = _pad_edge(ycc[..., 2], 8 * vs, 8 * hs)
    if subsample == "4:2:0":
        cb, cr = _downsample2(cb), _downsample2(cr)
    planes = [(y, qt_l), (cb, qt_c), (cr, qt_c)]
    comps_zz = [_quantize_plane(p, qt) for p, qt in planes]
    blocks_w = [p.shape[1] // 8 for p, _ in planes]
    blocks_h = [p.shape[0] // 8 for p, _ in planes]

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in ((0, qt_l), (1, qt_c)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(qt[ZIGZAG[i]]) for i in range(64))
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, h, w, 3)  # SOF2
    out += bytes([1, (hs << 4) | vs, 0])
    out += bytes([2, 0x11, 1])
    out += bytes([3, 0x11, 1])
    for cls, tid, (bits, vals) in (
        (0, 0, HT_DC_LUMA), (1, 0, HT_AC_LUMA),
        (0, 1, HT_DC_CHROMA), (1, 1, HT_AC_CHROMA),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)

    dc_tabs = [_canonical_codes(*HT_DC_LUMA), _canonical_codes(*HT_DC_CHROMA)]
    ac_tabs = [_canonical_codes(*HT_AC_LUMA), _canonical_codes(*HT_AC_CHROMA)]

    for comp_ids, ss, se, ah, al in scans:
        ns = len(comp_ids)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
        for ci in comp_ids:
            tid = 0 if ci == 0 else 1
            if ss == 0:
                out += bytes([ci + 1, tid << 4])
            else:
                out += bytes([ci + 1, tid])
        out += bytes([ss, se, (ah << 4) | al])
        # non-interleaved scans cover only the component's own
        # ceil-block grid (T.81 A.2.2) — NOT the padded MCU grid the
        # plane (and the interleaved DC scan) uses; walk coded dims
        # with the padded row stride
        coded = []
        for ci in range(3):
            ch_f = hs if ci == 0 else 1
            cv_f = vs if ci == 0 else 1
            cw = -(-w * ch_f // hs)
            ch_px = -(-h * cv_f // vs)
            coded.append((-(-ch_px // 8), -(-cw // 8)))
        bw_ = _BitWriter()
        if ss == 0:
            _encode_dc_scan(
                bw_, comps_zz, comp_ids, blocks_w, blocks_h,
                hs, vs, ah, al, dc_tabs, coded,
            )
        else:
            ci = comp_ids[0]
            act = ac_tabs[0 if ci == 0 else 1]
            nby, nbx = coded[ci]
            if ah == 0:
                _encode_ac_first(
                    bw_, comps_zz[ci], nby, nbx, blocks_w[ci],
                    ss, se, al, act,
                )
            else:
                _encode_ac_refine(
                    bw_, comps_zz[ci], nby, nbx, blocks_w[ci],
                    ss, se, al, act,
                )
        bw_.flush()
        out += bytes(bw_.buf)
    out += b"\xff\xd9"
    return bytes(out)


def _encode_dc_scan(
    bw_, comps_zz, comp_ids, blocks_w, blocks_h, hs, vs, ah, al, dc_tabs, coded
):
    """DC scan: interleaved MCU walk when ns>1 (raster -> MCU block
    order computed per component), else the component's block raster.
    First scan (Ah=0) DPCM-codes coef[0] >> Al (arithmetic shift);
    refinement emits bit Al of each DC value."""
    if len(comp_ids) > 1:
        mcus_y = blocks_h[0] // vs
        mcus_x = blocks_w[0] // hs
        pred = [0] * 3
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in comp_ids:
                    ch = hs if ci == 0 else 1
                    cv = vs if ci == 0 else 1
                    for bv in range(cv):
                        for bh in range(ch):
                            bi = (my * cv + bv) * blocks_w[ci] + (mx * ch + bh)
                            v = int(comps_zz[ci][bi][0]) >> al
                            if ah == 0:
                                diff = v - pred[ci]
                                pred[ci] = v
                                s = _category(diff)
                                code, ln = dc_tabs[0 if ci == 0 else 1][s]
                                bw_.write(code, ln)
                                if s:
                                    bw_.write(
                                        diff if diff >= 0 else diff + (1 << s) - 1, s
                                    )
                            else:
                                bw_.write(v & 1, 1)
    else:
        ci = comp_ids[0]
        pred0 = 0
        nby, nbx = coded[ci]
        for by in range(nby):
          for bx in range(nbx):
            bi = by * blocks_w[ci] + bx
            v = int(comps_zz[ci][bi][0]) >> al
            if ah == 0:
                diff = v - pred0
                pred0 = v
                s = _category(diff)
                code, ln = dc_tabs[0 if ci == 0 else 1][s]
                bw_.write(code, ln)
                if s:
                    bw_.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
            else:
                bw_.write(v & 1, 1)


def _iter_coded(nby, nbx, stride):
    for by in range(nby):
        for bx in range(nbx):
            yield by * stride + bx


def _encode_ac_first(bw_, zzs, nby, nbx, stride, ss, se, al, act):
    """AC first scan (T.81 G.1.2.2): zero-run/magnitude coding of the
    point-transformed band; blocks ending early emit EOB0 immediately
    (run cap 1 — see encode_jpeg_progressive)."""
    for bi in _iter_coded(nby, nbx, stride):
        zz = zzs[bi]
        r = 0
        for k in range(ss, se + 1):
            t = int(zz[k])
            if t < 0:
                mag = (-t) >> al
                bitsv = ~mag  # one's complement carries the sign
            else:
                mag = t >> al
                bitsv = mag
            if mag == 0:
                r += 1
                continue
            while r > 15:
                code, ln = act[0xF0]
                bw_.write(code, ln)
                r -= 16
            s = _category(mag)
            code, ln = act[(r << 4) | s]
            bw_.write(code, ln)
            bw_.write(bitsv & ((1 << s) - 1), s)
            r = 0
        if r:
            code, ln = act[0x00]  # EOB0
            bw_.write(code, ln)


def _encode_ac_refine(bw_, zzs, nby, nbx, stride, ss, se, al, act):
    """AC refinement scan (T.81 G.1.2.3): newly-significant coefs emit
    a (run, 1) symbol + sign bit; already-nonzero coefs contribute
    buffered correction bits appended after the next emitted symbol.
    EOB0 flushes at each early block end (run cap 1) together with its
    pending correction bits."""
    for bi in _iter_coded(nby, nbx, stride):
        zz = zzs[bi]
        absv = {}
        eob = ss - 1  # last newly-significant index (none -> before band)
        for k in range(ss, se + 1):
            t = int(zz[k])
            m = (-t if t < 0 else t) >> al
            absv[k] = m
            if m == 1:
                eob = k
        r = 0
        corr: list[int] = []
        for k in range(ss, se + 1):
            m = absv[k]
            if m == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                code, ln = act[0xF0]
                bw_.write(code, ln)
                r -= 16
                for b in corr:
                    bw_.write(b, 1)
                corr = []
            if m > 1:
                corr.append(m & 1)
                continue
            code, ln = act[(r << 4) | 1]
            bw_.write(code, ln)
            bw_.write(0 if int(zz[k]) < 0 else 1, 1)
            for b in corr:
                bw_.write(b, 1)
            corr = []
            r = 0
        if r > 0 or corr:
            code, ln = act[0x00]  # EOB0 + pending correction bits
            bw_.write(code, ln)
            for b in corr:
                bw_.write(b, 1)


# ---------------------------------------------------------- decoder


def decode_jpeg(data: bytes) -> np.ndarray:
    """JFIF bytes -> RGB uint8 (H, W, 3): baseline sequential (SOF0)
    and progressive DCT (SOF2, T.81 Annex G — spectral selection and
    successive approximation, DC and AC first + refinement scans).
    Grayscale SOF is replicated to 3 channels."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    coefs: list[np.ndarray] | None = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip the run so `marker` is the real id, never FF
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(seg[off + 1:off + 65], np.uint8).astype(np.int64)
                t = np.zeros(64, np.int64)
                t[ZIGZAG] = zz
                qtables[tq] = t
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                cls, tid = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1:off + 17])
                n = sum(bits)
                vals = list(seg[off + 17:off + 17 + n])
                huff[(cls, tid)] = _HuffDecoder(bits, vals)
                off += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
            if frame["progressive"]:
                # zigzag-order coefficient store per component, full
                # padded MCU grid (non-interleaved scans cover only the
                # component's own ceil-block grid; padding stays zero)
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcus_x = -(-w // (8 * hmax))
                mcus_y = -(-h // (8 * vmax))
                coefs = [
                    np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.int64)
                    for c in comps
                ]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"SOF{marker - 0xC0}: not baseline or progressive DCT"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append({"cs": cs, "dc": tt >> 4, "ac": tt & 0xF})
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            pos = pos + seglen
            if frame is None:
                raise ValueError("SOS before SOF")
            if not frame["progressive"]:
                return _decode_scan(
                    data, pos, frame, scan, qtables, huff, restart_interval
                )
            pos = _decode_progressive_scan(
                data, pos, frame, scan, ss, se, ahal >> 4, ahal & 0xF,
                huff, coefs, restart_interval,
            )
            continue
        pos += seglen
    if frame is not None and frame.get("progressive"):
        return _reconstruct_progressive(frame, coefs, qtables)
    raise ValueError("no SOS marker")


def _next_marker(data: bytes, pos: int) -> int:
    """Position of the next true marker: skips stuffed FF00, and lands
    on the LAST 0xFF of a fill run (T.81 B.1.1.2 allows any number of
    fill FFs before the marker id) so callers read the real id at
    pos+1. RSTn are not skipped — callers handle restarts."""
    n = len(data)
    while pos < n - 1:
        if data[pos] == 0xFF and data[pos + 1] not in (0x00, 0xFF):
            return pos
        pos += 1
    return n


def _decode_progressive_scan(
    data, pos, frame, scan, ss, se, ah, al, huff, coefs, restart_interval
):
    """One progressive scan (T.81 G.2): decode into the zigzag-order
    coefficient store and return the position of the next marker.

    Scan kinds: DC first (Ss=0, Ah=0 — MCU-interleaved when ns>1), DC
    refinement (Ss=0, Ah>0 — one bit per block), AC first (Ss>0, Ah=0
    — single component, EOB-run coded), AC refinement (Ss>0, Ah>0 —
    correction bits for already-nonzero coefficients plus newly
    significant ±2^Al insertions). The successive-approximation
    arithmetic mirrors the spec's flow charts (G.1.2.1-3, G.2.2)."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    br = _BitReader(data, pos)
    state = {"eobrun": 0, "pred": [0] * len(comps), "rst": 0, "units": 0}

    def check_restart():
        if restart_interval and state["units"] and (
            state["units"] % restart_interval == 0
        ):
            br.align_to_marker()
            m = data[br.pos + 1]
            if not (0xD0 <= m <= 0xD7) or (m - 0xD0) != state["rst"]:
                raise ValueError("restart marker sequence error")
            br.pos += 2
            state["rst"] = (state["rst"] + 1) % 8
            state["pred"] = [0] * len(comps)
            state["eobrun"] = 0

    def dc_first(ci, blk):
        dct = huff[(0, scan_dc[ci])]
        s = dct.decode(br)
        diff = _extend(br.bits(s), s) if s else 0
        state["pred"][ci] += diff
        blk[0] = state["pred"][ci] << al

    def dc_refine(blk):
        if br.bit():
            blk[0] |= 1 << al

    def ac_first(ci, blk):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        act = huff[(1, scan_ac[ci])]
        k = ss
        while k <= se:
            rs = act.decode(br)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += br.bits(r)
                    break
                k += 16
            else:
                k += r
                if k > se:
                    raise ValueError("AC index overflow in progressive scan")
                blk[k] = _extend(br.bits(s), s) << al
                k += 1

    def ac_refine(ci, blk):
        act = huff[(1, scan_ac[ci])]
        p1, m1 = 1 << al, -1 << al
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = act.decode(br)
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r != 15:
                        # EOB run: 1 << r (+ extension); NOT decremented
                        # here — the remaining-positions pass below
                        # consumes this block's share and decrements
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += br.bits(r)
                        break
                    # ZRL: skip 16 zero-history positions
                else:
                    if s != 1:
                        raise ValueError("AC refinement magnitude must be 1")
                    val = p1 if br.bit() else m1
                while k <= se:
                    if blk[k] != 0:
                        # correction bit for an already-nonzero coef
                        if br.bit() and not (int(blk[k]) & p1):
                            blk[k] += p1 if blk[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    blk[k] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if blk[k] != 0:
                    if br.bit() and not (int(blk[k]) & p1):
                        blk[k] += p1 if blk[k] >= 0 else m1
                k += 1
            state["eobrun"] -= 1

    scan_dc = {}
    scan_ac = {}
    for sc in scan:
        ci = by_id[sc["cs"]]
        scan_dc[ci] = sc["dc"]
        scan_ac[ci] = sc["ac"]

    if ss == 0:
        if se != 0:
            raise ValueError("DC scan must have Se == 0")
        if len(scan) > 1:
            # interleaved DC scan: MCU walk, all components
            for _my in range(mcus_y):
                for _mx in range(mcus_x):
                    check_restart()
                    for sc in scan:
                        ci = by_id[sc["cs"]]
                        c = comps[ci]
                        for bv in range(c["v"]):
                            for bh in range(c["h"]):
                                by = _my * c["v"] + bv
                                bx = _mx * c["h"] + bh
                                blk = coefs[ci][by, bx]
                                if ah == 0:
                                    dc_first(ci, blk)
                                else:
                                    dc_refine(blk)
                    state["units"] += 1
        else:
            ci = by_id[scan[0]["cs"]]
            nby, nbx = _coded_blocks(frame, ci)
            for by in range(nby):
                for bx in range(nbx):
                    check_restart()
                    blk = coefs[ci][by, bx]
                    if ah == 0:
                        dc_first(ci, blk)
                    else:
                        dc_refine(blk)
                    state["units"] += 1
    else:
        if len(scan) != 1:
            raise ValueError("AC scans must be non-interleaved (T.81 G.2)")
        ci = by_id[scan[0]["cs"]]
        nby, nbx = _coded_blocks(frame, ci)
        for by in range(nby):
            for bx in range(nbx):
                check_restart()
                blk = coefs[ci][by, bx]
                if ah == 0:
                    ac_first(ci, blk)
                else:
                    ac_refine(ci, blk)
                state["units"] += 1
    return _next_marker(data, br.pos)


def _coded_blocks(frame, ci) -> tuple[int, int]:
    """Non-interleaved scan geometry (T.81 A.2.2): ceil block dims of
    the component's OWN sample grid — no MCU padding."""
    c = frame["comps"][ci]
    hmax = max(x["h"] for x in frame["comps"])
    vmax = max(x["v"] for x in frame["comps"])
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _reconstruct_progressive(frame, coefs, qtables) -> np.ndarray:
    """Accumulated zigzag coefficients -> pixels: the same dequantize +
    IDCT + round/clip/upsample tail as the baseline path, vectorized
    over all blocks per component."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out_planes = []
    for c, zz in zip(comps, coefs):
        qt = qtables[c["tq"]]
        nby, nbx, _ = zz.shape
        deq = zz.astype(np.float64) * qt[ZIGZAG][None, None, :]
        nat = np.zeros_like(deq)
        nat[..., ZIGZAG] = deq
        blocks = nat.reshape(nby, nbx, 8, 8)
        # same operator chain as the baseline per-block IDCT so both
        # paths round identically (matmul broadcasts over blocks)
        spatial = _T.T @ blocks @ _T + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        plane = np.clip(_round_half_up(plane), 0, 255)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        g = out_planes[0].astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    ycc = np.stack(out_planes, axis=-1)
    return ycbcr_to_rgb(ycc)


def _decode_scan(data, pos, frame, scan, qtables, huff, restart_interval):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]), np.float64)
        )
    pred = [0] * len(comps)
    br = _BitReader(data, pos)
    mcu_count = 0
    expected_rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_to_marker()
                m = data[br.pos + 1]
                if not (0xD0 <= m <= 0xD7) or (m - 0xD0) != expected_rst:
                    raise ValueError("restart marker sequence error")
                br.pos += 2
                expected_rst = (expected_rst + 1) % 8
                pred = [0] * len(comps)
            for sc in scan:
                ci = by_id[sc["cs"]]
                c = comps[ci]
                dct = huff[(0, sc["dc"])]
                act = huff[(1, sc["ac"])]
                qt = qtables[c["tq"]]
                for blk_v in range(c["v"]):
                    for blk_h in range(c["h"]):
                        zz = np.zeros(64, np.int64)
                        s = dct.decode(br)
                        diff = _extend(br.bits(s), s) if s else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = act.decode(br)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
                        # dequantize + dezigzag + IDCT. qt is stored in
                        # natural order, zz in zigzag order: the table
                        # entry for zigzag position k is qt[ZIGZAG[k]]
                        # (a bare zz*qt mis-permutes the AC quantizers —
                        # caught by the convention-A regression test)
                        coef = np.zeros(64, np.float64)
                        coef[ZIGZAG] = (zz * qt[ZIGZAG]).astype(np.float64)
                        F = coef.reshape(8, 8)
                        spatial = _T.T @ F @ _T + 128.0
                        y0 = (my * c["v"] + blk_v) * 8
                        x0 = (mx * c["h"] + blk_h) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = spatial
            mcu_count += 1
    # round + clip each plane, upsample chroma by replication
    out_planes = []
    for c, p in zip(comps, planes):
        p = np.clip(_round_half_up(p), 0, 255)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        g = out_planes[0].astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    ycc = np.stack(out_planes, axis=-1)
    return ycbcr_to_rgb(ycc)
