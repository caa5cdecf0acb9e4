"""JPEG codec (stages/jpeg.py, ITU T.81 subset): baseline (SOF0) and
progressive (SOF2) decoder output must be bit-exact vs the
coefficient-path reconstruction (the independent inverse that skips the
entropy coder — pinning the huffman/bitstream layer), across
subsampling modes, odd dimensions, restart intervals, quality levels
and scan scripts. Progressive and baseline encoders share the forward
transform, so decode(progressive) must equal decode(baseline) exactly."""

import numpy as np
import pytest

from nifi_ray.oracle_expected import _expected_jpeg_pixels
from nifi_ray.stages import jpeg as J


CASES = [
    ((16, 16), "4:4:4", 90, 0),
    ((16, 16), "4:2:0", 75, 0),
    ((24, 17), "4:2:0", 50, 0),   # odd width → edge padding
    ((33, 31), "4:4:4", 75, 2),   # restart markers
    ((48, 32), "4:2:0", 85, 3),
    ((8, 8), "4:4:4", 100, 0),
]


def _noise(h, w):
    rng = np.random.RandomState(h * 1000 + w)
    return rng.randint(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("dims,sub,q,rst", CASES)
def test_roundtrip_bit_exact_vs_coefficient_path(dims, sub, q, rst):
    h, w = dims
    rgb = _noise(h, w)
    payload = J.encode_jpeg_baseline(rgb, quality=q, subsample=sub,
                                     restart_interval=rst)
    dec = J.decode_jpeg(payload)
    assert dec.shape == (h, w, 3)
    exp = _expected_jpeg_pixels(rgb, q, sub).astype(np.uint8)
    assert np.array_equal(dec, exp)


PROG_CASES = [
    ((16, 16), "4:4:4", 90),
    ((16, 16), "4:2:0", 75),
    ((24, 17), "4:2:0", 50),      # odd width → non-interleaved ceil grid
    ((33, 31), "4:4:4", 75),
    ((48, 32), "4:2:0", 85),      # chroma coded grid ≠ padded MCU grid
    ((8, 8), "4:4:4", 100),
]


@pytest.mark.parametrize("dims,sub,q", PROG_CASES)
def test_progressive_bit_exact_vs_baseline(dims, sub, q):
    """Same quantized coefficients, different entropy layout: the
    progressive decode must match the baseline decode byte-for-byte
    (which the tests above pin to the coefficient-path inverse)."""
    h, w = dims
    rgb = _noise(h, w)
    base = J.decode_jpeg(J.encode_jpeg_baseline(rgb, quality=q, subsample=sub))
    prog = J.decode_jpeg(J.encode_jpeg_progressive(rgb, quality=q, subsample=sub))
    assert prog.shape == (h, w, 3)
    assert np.array_equal(prog, base)


def test_progressive_custom_scan_script():
    """A spectral-selection-only script (no successive approximation)
    exercises the ah=al=0 AC path and interleaved DC without refinement."""
    scans = [
        ([0, 1, 2], 0, 0, 0, 0),
        ([0], 1, 31, 0, 0),
        ([0], 32, 63, 0, 0),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
    ]
    rgb = _noise(24, 17)
    base = J.decode_jpeg(J.encode_jpeg_baseline(rgb, quality=75, subsample="4:2:0"))
    prog = J.decode_jpeg(
        J.encode_jpeg_progressive(rgb, quality=75, subsample="4:2:0", scans=scans)
    )
    assert np.array_equal(prog, base)


def test_q100_flat_image_near_lossless():
    rgb = np.full((16, 16, 3), 128, np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg_baseline(rgb, quality=100,
                                               subsample="4:4:4"))
    assert np.abs(dec.astype(int) - 128).max() <= 1


def test_smooth_gradient_decodes_close():
    """Natural-image-like content should survive q85 with small error —
    a sanity check that the transform chain is actually DCT-coding, not
    accidentally correct on noise."""
    y, x = np.mgrid[0:32, 0:32]
    rgb = np.stack([(4 * x) % 256, (4 * y) % 256, ((2 * (x + y))) % 256],
                   axis=-1).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg_baseline(rgb, quality=85,
                                               subsample="4:4:4"))
    assert np.abs(dec.astype(int) - rgb.astype(int)).mean() < 6


def test_rejects_garbage_and_unsupported_sof():
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\x00\x01not a jpeg")
    rgb = np.zeros((8, 8, 3), np.uint8)
    # a baseline stream relabeled SOF2 is a MALFORMED progressive
    # stream (its single scan has Ss=0, Se=63): loud error, no mis-decode
    payload = bytearray(J.encode_jpeg_baseline(rgb))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC2
    with pytest.raises(ValueError):
        J.decode_jpeg(bytes(payload))
    # lossless sequential (SOF3) stays a loud NotImplementedError seam
    payload[i + 1] = 0xC3
    with pytest.raises(NotImplementedError):
        J.decode_jpeg(bytes(payload))


def test_dispatch_via_decode_rgb():
    from nifi_ray.stages.multimodal import _decode_rgb

    rgb = np.full((16, 16, 3), 77, np.uint8)
    out = _decode_rgb(J.encode_jpeg_baseline(rgb, quality=95))
    assert out.shape == (16, 16, 3) and np.abs(out.astype(int) - 77).max() <= 2
    prog = _decode_rgb(J.encode_jpeg_progressive(rgb, quality=95))
    assert prog.shape == (16, 16, 3) and np.abs(prog.astype(int) - 77).max() <= 2


def test_fill_bytes_before_markers_are_skipped():
    # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker;
    # both the segment loop and the entropy-scan marker search must skip
    # them (spec-valid padded files previously misparsed)
    img = (np.arange(16 * 16 * 3, dtype=np.uint8) % 251).reshape(16, 16, 3)
    blob = J.encode_jpeg_baseline(img, quality=90)
    ref = J.decode_jpeg(blob)

    # insert fill bytes before every marker segment after SOI
    out = bytearray(blob[:2])
    pos = 2
    while pos < len(blob) - 1:
        if blob[pos] == 0xFF and blob[pos + 1] not in (0x00,) and not (
            0xD0 <= blob[pos + 1] <= 0xD7
        ):
            out += b"\xff\xff\xff"  # three fill bytes
            out += blob[pos:pos + 2]
            pos += 2
            if blob[pos - 1] == 0xDA:  # copy entropy data untouched to EOI
                out += blob[pos:]
                break
        else:
            out += blob[pos:pos + 1]
            pos += 1
    padded = bytes(out)
    assert padded != blob
    got = J.decode_jpeg(padded)
    assert np.array_equal(got, ref)
