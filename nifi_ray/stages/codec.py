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

def _snappy_compress(b: bytes) -> bytes:
    # pyarrow bundles the snappy codec for parquet; reuse it here
    # (CompressContent.java lists snappy among its modes). Raw snappy
    # needs the uncompressed size at decompress time, so frame it with
    # an 8-byte little-endian length prefix.
    return len(b).to_bytes(8, "little") + pa.Codec("snappy").compress(b, asbytes=True)


def _snappy_decompress(b: bytes) -> bytes:
    n = int.from_bytes(b[:8], "little")
    return pa.Codec("snappy").decompress(b[8:], decompressed_size=n, asbytes=True)


_CODECS = {
    "gzip": (_gzip.compress, _gzip.decompress),
    "bzip2": (_bz2.compress, _bz2.decompress),
    "lzma": (_lzma.compress, _lzma.decompress),
    "snappy": (_snappy_compress, _snappy_decompress),
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


def convert_charset(col: str, src: str = "utf-8", dst: str = "utf-8",
                    out: str | None = None, errors: str = "strict"):
    """ConvertCharacterSet (reference STD/ConvertCharacterSet.java:182):
    re-encode a binary payload column from charset ``src`` to ``dst``.
    String input is first encoded with ``src``; output is binary (the
    payload stays an opaque blob, as in NiFi)."""

    def fn(batch: pa.Table) -> pa.Table:
        vals = []
        for v in batch[col].to_pylist():
            if v is None:
                vals.append(None)
                continue
            b = v if isinstance(v, bytes) else str(v).encode(src)
            vals.append(b.decode(src, errors=errors).encode(dst, errors=errors))
        arr = pa.array(vals, pa.binary())
        name = out or col
        if name in batch.schema.names:
            return batch.set_column(batch.schema.get_field_index(name), name, arr)
        return batch.append_column(name, arr)

    return fn


def unpack_content(col: str, fmt: str = "zip", out: str = "payload",
                   name_out: str = "entry_name"):
    """UnpackContent (reference STD/UnpackContent.java:538): explode a
    zip/tar archive blob into one row per member, carrying the NiFi
    fragment.* contract for a later merge. In-memory stdlib unpack —
    archives are per-record payloads, not whole datasets."""
    import io
    import tarfile
    import zipfile

    def members_of(blob: bytes):
        if fmt == "zip":
            with zipfile.ZipFile(io.BytesIO(blob)) as z:
                for info in z.infolist():
                    if not info.is_dir():
                        yield info.filename, z.read(info)
        elif fmt == "tar":
            with tarfile.open(fileobj=io.BytesIO(blob)) as t:
                for m in t.getmembers():
                    if m.isfile():
                        f = t.extractfile(m)
                        yield m.name, f.read() if f else b""
        else:
            raise ValueError(f"unknown archive format {fmt!r}")

    def fn(batch: pa.Table) -> pa.Table:
        keep = [c for c in batch.schema.names if c != col]
        parent_idx: list[int] = []
        names: list[str] = []
        payloads: list[bytes] = []
        frag_index: list[int] = []
        counts: list[int] = []
        for i, blob in enumerate(batch[col].to_pylist()):
            if blob is None:
                continue
            ms = list(members_of(blob))
            for j, (name, data) in enumerate(ms):
                parent_idx.append(i)
                names.append(name)
                payloads.append(data)
                frag_index.append(j)
                counts.append(len(ms))
        idx = pa.array(parent_idx, pa.int64())
        cols = {c: batch[c].take(idx) for c in keep}
        cols[name_out] = pa.array(names, pa.string())
        cols[out] = pa.array(payloads, pa.binary())
        cols["fragment_index"] = pa.array(frag_index, pa.int32())
        cols["fragment_count"] = pa.array(counts, pa.int32())
        return pa.table(cols)

    return fn


def encrypt_content(col: str, key: bytes, out: str | None = None, mode: str = "encrypt"):
    """EncryptContent (reference STD/EncryptContent.java): AES-256-GCM
    over a binary/string payload column.

    Deterministic (SIV-style) nonce: the 12-byte nonce is
    HMAC-SHA256(key, plaintext)[:12], prepended to the ciphertext. A
    replayed/retried task therefore reproduces byte-identical output —
    the engine's idempotency contract — at the standard deterministic-
    encryption cost of leaking plaintext equality (what AES-GCM-SIV
    accepts by design). Key management stays the caller's problem, as
    in the reference.
    """
    import hmac as _hmac
    import hashlib as _hashlib

    from cryptography.hazmat.primitives.ciphers.aead import AESGCM

    if len(key) not in (16, 24, 32):
        raise ValueError("key must be 16/24/32 bytes")
    aes = AESGCM(key)

    def enc(b: bytes) -> bytes:
        nonce = _hmac.new(key, b, _hashlib.sha256).digest()[:12]
        return nonce + aes.encrypt(nonce, b, None)

    def dec(b: bytes) -> bytes:
        return aes.decrypt(b[:12], b[12:], None)

    fn_ = enc if mode == "encrypt" else dec

    def fn(batch: pa.Table) -> pa.Table:
        vals = [None if v is None else fn_(_as_bytes(v)) for v in batch[col].to_pylist()]
        arr = pa.array(vals, pa.binary())
        name = out or col
        if name in batch.schema.names:
            return batch.set_column(batch.schema.get_field_index(name), name, arr)
        return batch.append_column(name, arr)

    return fn


def pack_content(
    col: str = "payload",
    name_col: str = "entry_name",
    fmt: str = "zip",
    out: str = "archive",
):
    """MergeContent's tar/zip Merge Formats (reference
    STD/MergeContent.java:159-165 — bins can emit concat, tar, zip,
    flowfile-stream or avro): the inverse of ``unpack_content``. A
    merge body: one TABLE OF MEMBERS in (rows of a bin, e.g. from
    ``bin_pack`` or ``map_groups``) → one 1-row table with the archive
    blob. Archive metadata is pinned (zip epoch date, tar mtime 0,
    no uid/gid) so retried merges are byte-identical — the same
    idempotency convention as the lake's part files. The 'avro' merge
    format is ``sources.avro.table_to_avro`` on the bin's rows; 'concat'
    is ``pyarrow.compute.binary_join``."""
    import io
    import tarfile
    import zipfile

    def fn(group: pa.Table) -> pa.Table:
        names = group[name_col].to_pylist()
        blobs = group[col].to_pylist()
        buf = io.BytesIO()
        if fmt == "zip":
            with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
                for name, blob in zip(names, blobs):
                    info = zipfile.ZipInfo(name or "", date_time=(1980, 1, 1, 0, 0, 0))
                    info.compress_type = zipfile.ZIP_DEFLATED
                    z.writestr(info, blob or b"")
        elif fmt == "tar":
            with tarfile.open(fileobj=buf, mode="w") as t:
                for name, blob in zip(names, blobs):
                    data = blob or b""
                    info = tarfile.TarInfo(name or "")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    t.addfile(info, io.BytesIO(data))
        else:
            raise ValueError(f"unknown archive format {fmt!r}")
        return pa.table(
            {
                out: pa.array([buf.getvalue()], pa.binary()),
                "entry_count": pa.array([len(names)], pa.int32()),
            }
        )

    return fn
