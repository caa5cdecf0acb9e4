"""ParseEvtx — Windows event-log (EVTX) record framing.

Reference: nifi-evtx-bundle/.../evtx/ParseEvtx.java (+ parser/
FileHeader.java, ChunkHeader.java, Record.java): split a .evtx blob at
File / Chunk / Record granularity, verifying the per-chunk CRC32s, and
emit one output per record.

Scope, stated plainly: this implements the FRAME level — file header
(``ElfFile``), 64 KiB chunks (``ElfChnk``) with record-data CRC32
verification, record framing (magic ``2A 2A 00 00``, size, record id,
FILETIME timestamp, trailing size) — which is what determines the
reference's split/routing behavior. The record PAYLOAD is Microsoft's
binary-XML; decoding it needs a template-table interpreter that is out
of scope here, so the payload is emitted as raw ``payload`` bytes (for
our fixtures: UTF-16LE XML) plus a best-effort ``payload_text``
(UTF-16LE decode or None). Bad chunks route to an ``error`` per chunk
instead of failing the file (ParseEvtx REL_BAD_CHUNK).

``write_evtx`` builds structurally-valid fixtures (correct magics,
sizes, CRCs, FILETIMEs) so the parser's checks are exercised for real.
"""

from __future__ import annotations

import struct
import zlib
from datetime import datetime, timezone

import pyarrow as pa

_EPOCH_FILETIME = 116444736000000000  # 1601→1970 in 100ns ticks
_CHUNK = 65536


def _to_filetime(ts_us: int) -> int:
    return ts_us * 10 + _EPOCH_FILETIME


def _from_filetime(ft: int) -> int:
    return (ft - _EPOCH_FILETIME) // 10  # µs since epoch


def write_evtx(records: list[tuple[int, int, str]]) -> bytes:
    """Fixture writer: [(record_id, ts_us, xml_text)] → EVTX bytes
    (one or more chunks; payload stored as UTF-16LE text where real
    files carry binary-XML — framing, ids, FILETIMEs and CRCs are
    real)."""
    chunks = []
    i = 0
    while i < len(records) or not chunks:
        data = b""
        first = i
        while i < len(records):
            rid, ts_us, xml = records[i]
            payload = xml.encode("utf-16-le")
            size = 24 + len(payload) + 4
            rec = (
                b"\x2a\x2a\x00\x00"
                + struct.pack("<IQQ", size, rid, _to_filetime(ts_us))
                + payload
                + struct.pack("<I", size)
            )
            if 512 + len(data) + len(rec) > _CHUNK:
                break
            data += rec
            i += 1
        n_in_chunk = i - first
        first_id = records[first][0] if n_in_chunk else 0
        last_id = records[i - 1][0] if n_in_chunk else 0
        data_crc = zlib.crc32(data) & 0xFFFFFFFF
        head = (
            b"ElfChnk\x00"
            + struct.pack(
                "<QQQQ",
                first_id,
                last_id,
                first_id,
                last_id,
            )
            + struct.pack("<IIII", 128, 512 + len(data), 512 + len(data), data_crc)
        )
        head = head.ljust(120, b"\x00")
        head_crc = zlib.crc32(head) & 0xFFFFFFFF
        chunk = (head + struct.pack("<I", head_crc)).ljust(512, b"\x00") + data
        chunks.append(chunk.ljust(_CHUNK, b"\x00"))
        if i >= len(records):
            break
    fh = (
        b"ElfFile\x00"
        + struct.pack("<QQQ", 0, len(chunks) - 1, (records[-1][0] + 1) if records else 1)
        + struct.pack("<IHHHH", 128, 1, 3, 4096, len(chunks))
    )
    fh = fh.ljust(120, b"\x00") + struct.pack("<I", zlib.crc32(b"") & 0xFFFFFFFF)
    return fh.ljust(4096, b"\x00") + b"".join(chunks)


def parse_evtx_bytes(blob: bytes):
    """→ (records, chunk_errors): records = list of dicts with
    chunk_index / record_id / ts_us / payload / payload_text."""
    records, errors = [], []
    if blob[:8] != b"ElfFile\x00":
        return [], ["bad file magic"]
    (chunk_count,) = struct.unpack_from("<H", blob, 42)
    off = 4096
    for ci in range(chunk_count):
        base = off + ci * _CHUNK
        chunk = blob[base : base + _CHUNK]
        if chunk[:8] != b"ElfChnk\x00":
            errors.append(f"chunk {ci}: bad magic")
            continue
        free_off, _last_off, data_crc = struct.unpack_from("<III", chunk, 44)
        data = chunk[512:free_off]
        if (zlib.crc32(data) & 0xFFFFFFFF) != data_crc:
            errors.append(f"chunk {ci}: record-data CRC mismatch")
            continue
        p = 0
        while p + 24 <= len(data):
            if data[p : p + 4] != b"\x2a\x2a\x00\x00":
                break
            size, rid, ft = struct.unpack_from("<IQQ", data, p + 4)
            if size < 28 or p + size > len(data):
                errors.append(f"chunk {ci}: truncated record {rid}")
                break
            (size2,) = struct.unpack_from("<I", data, p + size - 4)
            if size2 != size:
                errors.append(f"chunk {ci}: size mismatch in record {rid}")
                break
            payload = data[p + 24 : p + size - 4]
            try:
                text = payload.decode("utf-16-le")
            except UnicodeDecodeError:
                text = None  # real binary-XML lands here — not decoded
            records.append(
                {
                    "chunk_index": ci,
                    "record_id": rid,
                    "ts_us": _from_filetime(ft),
                    "payload": payload,
                    "payload_text": text,
                }
            )
            p += size
    return records, errors


def parse_evtx(col: str = "content", keep_cols: list[str] | None = None):
    """map_batches body: EVTX blob column → one row per record
    (granularity=Record), with per-blob ``chunk_errors`` replicated so
    bad chunks are countable without killing the good ones."""
    keep = keep_cols or []

    def fn(batch: pa.Table) -> pa.Table:
        idx, recs, errs = [], [], []
        for i, blob in enumerate(batch[col].to_pylist()):
            if blob is None:
                continue
            rs, es = parse_evtx_bytes(blob)
            for r in rs:
                idx.append(i)
                recs.append(r)
                errs.append("; ".join(es) if es else None)
        base = (
            batch.select(keep).take(pa.array(idx, pa.int64()))
            if keep
            else pa.table({"_i": pa.array(idx, pa.int64())})
        )
        for name, typ in (
            ("chunk_index", pa.int32()),
            ("record_id", pa.int64()),
            ("ts_us", pa.int64()),
            ("payload", pa.binary()),
            ("payload_text", pa.string()),
        ):
            base = base.append_column(name, pa.array([r[name] for r in recs], typ))
        return base.append_column("chunk_errors", pa.array(errs, pa.string()))

    return fn


def filetime_to_iso(ts_us: int) -> str:
    return datetime.fromtimestamp(ts_us / 1e6, timezone.utc).isoformat()


# ---- graded fixture corpus ------------------------------------------
# Parameters are module constants so the expected-oracle builder can
# recompute every parsed row from them WITHOUT parsing any bytes — the
# same dual-pinning contract as multimodal.synth_mp4_table.

EVTX_FIXTURE_BASE_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z


def evtx_fixture_records(i: int, seed: int = 0) -> list[tuple[int, int, str]]:
    """Spec-derived records for fixture file ``i``: 3 + (i % 5) records
    with arithmetic ids/timestamps and a tiny XML payload."""
    n = 3 + (i % 5)
    return [
        (
            i * 1000 + seed + j,
            EVTX_FIXTURE_BASE_US + (i * 97 + j * 13) * 1_000_000,
            f"<Event><EventID>{i * 1000 + seed + j}</EventID>"
            f"<Task>{j}</Task></Event>",
        )
        for j in range(n)
    ]


def synth_evtx_table(n_files: int, seed: int = 0) -> pa.Table:
    """Deterministic EVTX corpus: structurally-valid files (real magics,
    CRCs, FILETIMEs) whose record set is a pure function of (i, seed)."""
    return pa.table(
        {
            "file_id": pa.array(
                [f"evtx{i:06d}" for i in range(n_files)], pa.string()
            ),
            "content": pa.array(
                [write_evtx(evtx_fixture_records(i, seed)) for i in range(n_files)],
                pa.binary(),
            ),
        }
    )
