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


# ---------------------------------------------------------- decoder


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> RGB uint8 (H, W, 3) (grayscale SOF is
    replicated to 3 channels)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
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
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"SOF{marker - 0xC0}: not baseline sequential")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append({"cs": cs, "dc": tt >> 4, "ac": tt & 0xF})
            pos = pos + seglen
            return _decode_scan(
                data, pos, frame, scan, qtables, huff, restart_interval
            )
        pos += seglen
    raise ValueError("no SOS marker")


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
                        # dequantize + dezigzag + IDCT
                        coef = np.zeros(64, np.float64)
                        coef[ZIGZAG] = (zz * qt).astype(np.float64)
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
