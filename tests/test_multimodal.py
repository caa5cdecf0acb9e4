"""Real media codecs + actor-pool stages (stages/multimodal.py).

Codec round-trips are pure numpy/stdlib (no Ray); the stage tests run
the callable classes directly on Arrow batches — exactly what
map_batches does per batch — plus one Dataset-level smoke in
test_queries_smoke.py via the graded queries.
"""

import numpy as np
import pyarrow as pa
import pytest

from nifi_ray.stages.multimodal import (
    DecodeAudio,
    DecodeImage,
    ResizeImage,
    SampleFrames,
    _synth_rgb,
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    iter_ppm_frames,
    resize_nearest,
    synth_bmp_table,
    synth_video_table,
    synth_wav_table,
)


def test_bmp_roundtrip_odd_width():
    # w=33 → row stride padding (33*3=99 → 100); the classic BMP bug
    img = _synth_rgb(33, 17, 42)
    assert img.shape == (17, 33, 3)
    back = decode_bmp(encode_bmp(img))
    assert np.array_equal(back, img)


def test_ppm_roundtrip_and_comment_header():
    img = _synth_rgb(7, 5, 9)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # header with a comment line still parses
    withc = b"P6\n# made by test\n7 5\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(withc), img)


def test_wav_roundtrip():
    samples = ((np.arange(500) * 37) % 2001 - 1000).astype(np.int16)
    rate, back = decode_wav(encode_wav(samples, 16000))
    assert rate == 16000
    assert np.array_equal(back, samples)


def test_decode_image_real_stats():
    t = synth_bmp_table(6, seed=1)
    out = DecodeImage()(t)
    # decoded dims match metadata dims
    assert out["px_w"].to_pylist() == out["width"].to_pylist()
    assert out["px_h"].to_pylist() == out["height"].to_pylist()
    # channel sums match a direct numpy recompute of the first image
    img = decode_bmp(t["payload"][0].as_py())
    s = img.reshape(-1, 3).sum(axis=0)
    assert out["sum_r"][0].as_py() == int(s[0])
    assert out["sum_g"][0].as_py() == int(s[1])
    assert out["sum_b"][0].as_py() == int(s[2])
    assert len(out["features"][0]) == DecodeImage.FEAT_DIM


def test_decode_image_unknown_format_raises():
    # jpeg is now a real codec (stages/jpeg.py) — corrupt jpeg bytes are a
    # ValueError from the parser; a format with NO codec (GIF) stays a
    # loud NotImplementedError seam
    def row(payload, mime):
        return pa.table(
            {
                "media_id": ["x"],
                "media_type": [mime],
                "payload": pa.array([payload], pa.binary()),
                "width": pa.array([1], pa.int32()),
                "height": pa.array([1], pa.int32()),
            }
        )

    with pytest.raises(ValueError):
        DecodeImage()(row(b"\xff\xd8\xff\xe0 not decodable", "image/jpeg"))
    with pytest.raises(NotImplementedError):
        DecodeImage()(row(b"GIF87a not supported", "image/gif"))


def test_resize_nearest_identity_and_downscale():
    img = _synth_rgb(8, 8, 3)
    assert np.array_equal(resize_nearest(img, 8, 8), img)
    down = resize_nearest(img, 4, 4)
    # floor mapping: dst (y,x) ← src (y*8//4, x*8//4) = (2y, 2x)
    assert np.array_equal(down, img[::2, ::2])


def test_resize_stage_reencodes_same_format():
    from nifi_ray.stages.multimodal import _decode_rgb

    t = synth_bmp_table(6, seed=2)  # rotates BMP/PNG/PPM payloads
    out = ResizeImage(10, 6)(t)
    for orig, p in zip(t["payload"].to_pylist(), out["payload"].to_pylist()):
        assert p[:2] == orig[:2]  # same container format back
        assert _decode_rgb(p).shape == (6, 10, 3)
    assert out["width"].to_pylist() == [10] * 6
    assert out["height"].to_pylist() == [6] * 6


def test_decode_audio_features():
    t = synth_wav_table(5, seed=7)
    out = DecodeAudio()(t)
    rate, x = decode_wav(t["payload"][0].as_py())
    assert out["sample_rate"][0].as_py() == rate
    assert out["n_samples"][0].as_py() == len(x)
    nonneg = x >= 0
    assert out["n_zero_cross"][0].as_py() == int(np.sum(nonneg[:-1] != nonneg[1:]))
    assert out["abs_sum"][0].as_py() == int(np.abs(x.astype(np.int64)).sum())


def test_sample_frames_spans_and_sampling():
    t = synth_video_table(2, frames=7, seed=4, w=6, h=4)
    payload = t["payload"][0].as_py()
    spans = list(iter_ppm_frames(payload))
    assert len(spans) == 7
    # spans tile the buffer exactly
    assert spans[0][1] == 0 and spans[-1][2] == len(payload)
    out = SampleFrames(every=2)(t)
    assert out["frame_idx"].to_pylist() == [0, 2, 4, 6] * 2
    # each emitted frame is a standalone decodable PPM
    for p, fi in zip(out["payload"].to_pylist(), out["frame_idx"].to_pylist()):
        assert decode_ppm(p).shape == (4, 6, 3)


def test_png_roundtrip_all_colortypes():
    import numpy as np

    from nifi_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.default_rng(5)
    for shape in [(13, 17), (13, 17, 3), (9, 5, 4)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        back = decode_png(encode_png(img))
        assert back.shape == img.shape
        assert (back == img).all()


def test_png_all_filters_decode():
    """Hand-build a PNG whose five rows use filters 0..4 and check the
    unfilter path against a trivially-slow reference."""
    import struct
    import zlib

    import numpy as np

    from nifi_ray.stages.multimodal import _PNG_SIG, decode_png

    rng = np.random.default_rng(7)
    w, h, ch = 6, 5, 3
    img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8).astype(np.int32)
    stride, bpp = w * ch, ch
    flat = img.reshape(h, stride)
    raw = bytearray()
    for y in range(h):
        f = y % 5
        raw.append(f)
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        for x in range(stride):
            cur = int(flat[y, x])
            a = int(flat[y, x - bpp]) if x >= bpp else 0
            b_ = int(prev[x])
            c_ = int(prev[x - bpp]) if x >= bpp else 0
            if f == 0:
                enc = cur
            elif f == 1:
                enc = cur - a
            elif f == 2:
                enc = cur - b_
            elif f == 3:
                enc = cur - (a + b_) // 2
            else:
                p = a + b_ - c_
                pa_, pb, pc = abs(p - a), abs(p - b_), abs(p - c_)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b_ if pb <= pc else c_)
                enc = cur - pred
            raw.append(enc % 256)

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    png = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(png) == img.astype(np.uint8)).all()


def test_png_crc_and_dispatch():
    import numpy as np
    import pytest

    from nifi_ray.stages.multimodal import _decode_rgb, decode_png, encode_png

    img = np.zeros((4, 4, 3), np.uint8)
    png = bytearray(encode_png(img))
    png[40] ^= 0xFF  # corrupt inside a chunk
    with pytest.raises(ValueError):
        decode_png(bytes(png))
    # dispatch: gray PNG → replicated RGB; RGBA → alpha dropped
    gray = np.arange(16, dtype=np.uint8).reshape(4, 4)
    rgb = _decode_rgb(encode_png(gray))
    assert rgb.shape == (4, 4, 3) and (rgb[:, :, 0] == gray).all()
    rgba = np.dstack([gray, gray, gray, np.full((4, 4), 7, np.uint8)])
    assert _decode_rgb(encode_png(rgba)).shape == (4, 4, 3)
