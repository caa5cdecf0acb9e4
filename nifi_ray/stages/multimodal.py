"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video travel as ``payload: binary`` columns with metadata
(``media_type``, ``width``/``height``/``sample_rate``…), exactly like
NiFi FlowFile content + attributes (reference
nifi-api/.../flowfile/FlowFile.java:104-109; media processors
nifi-media-bundle/.../ResizeImage.java, ExtractMediaMetadata.java).

The decode kernels themselves are STUBS in this container (no
PIL/ffmpeg): each actor either raises NotImplementedError (default) or
produces a deterministic fake derived from the payload bytes
(``fake=True``) so the Ray-side plumbing — schema, batch sizing, actor
signatures, output layout — is real and tested. Swap ``_decode_impl``
for a real library in production.

Scale notes: binary payloads make rows WIDE — callers should use small
``batch_size`` (payload bytes × batch_size × concurrency must fit the
worker heap) and ``batch_format="pyarrow"`` (binary columns do not
round-trip pandas cleanly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util.hashing import mix_u64

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("media_type", pa.string()),  # image/jpeg, audio/wav, ...
        pa.field("payload", pa.binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
    ]
)


def _bytes_key(buf: bytes) -> np.ndarray:
    import zlib

    return mix_u64(np.array([zlib.crc32(buf)], dtype=np.uint64))


class DecodeImage:
    """Actor-pool stage: payload → decoded dims + feature vector.

    fake=False: raises NotImplementedError (no imaging libs here).
    fake=True: deterministic pseudo-decode — dims from metadata, a
    16-dim feature vector seeded by the payload's CRC.
    """

    FEAT_DIM = 16

    def __init__(self, fake: bool = False):
        self.fake = fake

    def _decode_impl(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires an imaging library not present in "
                "this container; construct with fake=True for plumbing tests"
            )
        key = _bytes_key(payload)[0]
        rng = np.arange(self.FEAT_DIM, dtype=np.uint64)
        vals = mix_u64(rng * np.uint64(0x9E3779B97F4A7C15) ^ key)
        return (vals % np.uint64(1000)).astype(np.float32) / 1000.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload, w, h in zip(
            batch["payload"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            feats.append(self._decode_impl(payload or b"", w or 0, h or 0))
        flat = np.concatenate(feats) if feats else np.zeros(0, np.float32)
        offsets = pa.array(
            np.arange(0, (len(feats) + 1) * self.FEAT_DIM, self.FEAT_DIM, dtype=np.int32)
        )
        col = pa.ListArray.from_arrays(offsets, pa.array(flat, pa.float32()))
        return batch.append_column("features", col)


class ResizeImage:
    """Actor-pool stage: ResizeImage analog (reference
    nifi-media-bundle/.../ResizeImage.java). Stub: recomputes metadata
    (target dims) and, in fake mode, re-keys the payload
    deterministically; raises otherwise."""

    def __init__(self, width: int, height: int, fake: bool = False):
        self.w, self.h, self.fake = width, height, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("resize requires an imaging library")
        n = batch.num_rows
        batch = batch.set_column(
            batch.schema.get_field_index("width"), "width", pa.array([self.w] * n, pa.int32())
        )
        return batch.set_column(
            batch.schema.get_field_index("height"), "height", pa.array([self.h] * n, pa.int32())
        )


def synth_media_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic fake media rows for plumbing tests/benchmarks."""
    ids = [f"m{i:06d}" for i in range(n)]
    payloads = [
        mix_u64(np.arange(64, dtype=np.uint64) + np.uint64(seed * 1_000_003 + i)).tobytes()
        for i in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array(ids),
            "media_type": pa.array(["image/fake"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([64] * n, pa.int32()),
            "height": pa.array([48] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )
