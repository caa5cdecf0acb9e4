"""Content codecs over binary/string columns — CompressContent,
EncodeContent, ModifyBytes semantics (reference
nifi-standard-processors/.../standard/CompressContent.java:
gzip/bzip2/lzma/snappy modes; Base64EncodeContent.java; EncodeContent.java;
ModifyBytes.java: head/tail trims).

Per-row stdlib codec calls (C-speed per value). In-lake compression is
Parquet's job (zstd at the sink); these stages exist for payload parity
when moving opaque blobs through a pipeline.
"""

from __future__ import annotations

import bz2 as _bz2
import gzip as _gzip
import lzma as _lzma

import pyarrow as pa

_CODECS = {
    "gzip": (_gzip.compress, _gzip.decompress),
    "bzip2": (_bz2.compress, _bz2.decompress),
    "lzma": (_lzma.compress, _lzma.decompress),
}


def _as_bytes(v) -> bytes | None:
    if v is None:
        return None
    return v if isinstance(v, bytes) else str(v).encode()


def compress(col: str, codec: str = "gzip", out: str | None = None, mode: str = "compress"):
    """map_batches body; mode='compress' | 'decompress'."""
    comp, decomp = _CODECS[codec]
    fn_ = comp if mode == "compress" else decomp

    def fn(batch: pa.Table) -> pa.Table:
        vals = [None if v is None else fn_(_as_bytes(v)) for v in batch[col].to_pylist()]
        arr = pa.array(vals, pa.binary())
        name = out or col
        if name in batch.schema.names:
            return batch.set_column(batch.schema.get_field_index(name), name, arr)
        return batch.append_column(name, arr)

    return fn


def modify_bytes(col: str, head: int = 0, tail: int = 0, out: str | None = None):
    """Trim ``head`` bytes from the front and ``tail`` from the back
    (ModifyBytes)."""

    def fn(batch: pa.Table) -> pa.Table:
        vals = []
        for v in batch[col].to_pylist():
            if v is None:
                vals.append(None)
                continue
            b = _as_bytes(v)
            end = len(b) - tail if tail else len(b)
            vals.append(b[head:max(head, end)])
        arr = pa.array(vals, pa.binary())
        name = out or col
        if name in batch.schema.names:
            return batch.set_column(batch.schema.get_field_index(name), name, arr)
        return batch.append_column(name, arr)

    return fn
