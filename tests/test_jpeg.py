"""Baseline JPEG codec (stages/jpeg.py, ITU T.81 subset): decoder
output must be bit-exact vs the coefficient-path reconstruction (the
independent inverse that skips the entropy coder — pinning the huffman/
bitstream layer), across subsampling modes, odd dimensions, restart
intervals, and quality levels."""

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


@pytest.mark.parametrize("dims,sub,q,rst", CASES)
def test_roundtrip_bit_exact_vs_coefficient_path(dims, sub, q, rst):
    h, w = dims
    rng = np.random.RandomState(h * 1000 + w)
    rgb = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    payload = J.encode_jpeg_baseline(rgb, quality=q, subsample=sub,
                                     restart_interval=rst)
    dec = J.decode_jpeg(payload)
    assert dec.shape == (h, w, 3)
    exp = _expected_jpeg_pixels(rgb, q, sub).astype(np.uint8)
    assert np.array_equal(dec, exp)


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


def test_rejects_progressive_and_garbage():
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\x00\x01not a jpeg")
    # SOF2 (progressive) must raise loudly, not mis-decode
    rgb = np.zeros((8, 8, 3), np.uint8)
    payload = bytearray(J.encode_jpeg_baseline(rgb))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        J.decode_jpeg(bytes(payload))


def test_dispatch_via_decode_rgb():
    from nifi_ray.stages.multimodal import _decode_rgb

    rgb = np.full((16, 16, 3), 77, np.uint8)
    out = _decode_rgb(J.encode_jpeg_baseline(rgb, quality=95))
    assert out.shape == (16, 16, 3) and np.abs(out.astype(int) - 77).max() <= 2
