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
    t = pa.table(
        {
            "media_id": ["x"],
            "media_type": ["image/jpeg"],
            "payload": pa.array([b"\xff\xd8\xff\xe0 not decodable"], pa.binary()),
            "width": pa.array([1], pa.int32()),
            "height": pa.array([1], pa.int32()),
        }
    )
    with pytest.raises(NotImplementedError):
        DecodeImage()(t)


def test_resize_nearest_identity_and_downscale():
    img = _synth_rgb(8, 8, 3)
    assert np.array_equal(resize_nearest(img, 8, 8), img)
    down = resize_nearest(img, 4, 4)
    # floor mapping: dst (y,x) ← src (y*8//4, x*8//4) = (2y, 2x)
    assert np.array_equal(down, img[::2, ::2])


def test_resize_stage_reencodes_same_format():
    t = synth_bmp_table(4, seed=2)
    out = ResizeImage(10, 6)(t)
    for p in out["payload"].to_pylist():
        img = decode_bmp(p)
        assert img.shape == (6, 10, 3)
    assert out["width"].to_pylist() == [10] * 4
    assert out["height"].to_pylist() == [6] * 4


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
