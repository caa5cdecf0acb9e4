"""ISO Base Media File Format (mp4/QuickTime) container codec.

The ExtractMediaMetadata / media frame-sampling analog for mp4 payloads
(reference nifi-media-bundle/.../ExtractMediaMetadata.java — Tika-based
container metadata; MediaInfoService — track/codec/duration fields).
This is a from-scratch parser of the PUBLIC container spec (ISO/IEC
14496-12): box walker, moov/trak/stbl sample tables, and the QuickTime
uncompressed-RGB ``raw `` video codec, which this container can decode
without external libraries. Transform-coded tracks (avc1/hev1/mp4a) are
parseable — metadata and sample spans come out — but their SAMPLE
decode raises ``NotImplementedError`` loudly: that is the seam where
ffmpeg would plug in.

Everything here is span-based: sample extraction yields (offset, size)
into the original buffer so frame sampling never copies skipped frames,
matching the concatenated-PPM path in ``multimodal.SampleFrames``.

Scale notes: containers are parsed per payload inside actor-pool
``map_batches`` stages — the moov tree is tiny (KBs) regardless of
mdat size, so metadata extraction over a 100 TB corpus reads only the
box headers it walks. Parquet binary columns keep payloads zero-copy
from the object store.
"""

from __future__ import annotations

import struct

import numpy as np

# boxes whose payload is a sequence of child boxes (14496-12 §8)
_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"dinf", b"stbl",
    b"edts", b"udta", b"mvex", b"moof", b"traf",
}


def iter_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Yield (fourcc, payload_start, payload_end) for each box in
    [start, end). Handles 64-bit largesize (size==1) and to-end-of-file
    (size==0) boxes."""
    end = len(data) if end is None else end
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        fourcc = data[pos + 4:pos + 8]
        payload = pos + 8
        if size == 1:
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            payload = pos + 16
        elif size == 0:
            size = end - pos
        if size < payload - pos or pos + size > end:
            raise ValueError(f"bad box size {size} at {pos}")
        yield fourcc, payload, pos + size
        pos += size


def find_box(data: bytes, path: list[bytes], start: int = 0,
             end: int | None = None) -> tuple[int, int] | None:
    """(payload_start, payload_end) of the first box at ``path``
    (e.g. [b'moov', b'trak', b'mdia']), or None."""
    for fourcc, ps, pe in iter_boxes(data, start, end):
        if fourcc == path[0]:
            if len(path) == 1:
                return ps, pe
            # keep scanning SIBLINGS when this subtree lacks the rest
            # of the path (e.g. a hint trak before the video trak)
            found = find_box(data, path[1:], ps, pe)
            if found is not None:
                return found
    return None


def _full(data: bytes, ps: int) -> tuple[int, int]:
    """FullBox header: (version, flags)."""
    v = data[ps]
    flags = int.from_bytes(data[ps + 1:ps + 4], "big")
    return v, flags


def _parse_mvhd(data: bytes, ps: int) -> tuple[int, int]:
    """(timescale, duration) — version 0 (u32 times) and 1 (u64)."""
    v, _ = _full(data, ps)
    if v == 1:
        ts = struct.unpack_from(">I", data, ps + 4 + 16)[0]
        dur = struct.unpack_from(">Q", data, ps + 4 + 20)[0]
    else:
        ts = struct.unpack_from(">I", data, ps + 4 + 8)[0]
        dur = struct.unpack_from(">I", data, ps + 4 + 12)[0]
    return ts, dur


def _parse_tkhd(data: bytes, ps: int) -> tuple[int, int, int]:
    """(track_id, width, height) — width/height are 16.16 fixed."""
    v, _ = _full(data, ps)
    base = ps + 4
    if v == 1:
        tid = struct.unpack_from(">I", data, base + 16)[0]
        geo = base + 16 + 4 + 4 + 8  # track_id, reserved, duration(u64)
    else:
        tid = struct.unpack_from(">I", data, base + 8)[0]
        geo = base + 8 + 4 + 4 + 4
    # reserved(8) layer(2) alt_group(2) volume(2) reserved(2) matrix(36)
    geo += 8 + 2 + 2 + 2 + 2 + 36
    w = struct.unpack_from(">I", data, geo)[0] >> 16
    h = struct.unpack_from(">I", data, geo + 4)[0] >> 16
    return tid, w, h


def _parse_mdhd(data: bytes, ps: int) -> tuple[int, int]:
    v, _ = _full(data, ps)
    if v == 1:
        ts = struct.unpack_from(">I", data, ps + 4 + 16)[0]
        dur = struct.unpack_from(">Q", data, ps + 4 + 20)[0]
    else:
        ts = struct.unpack_from(">I", data, ps + 4 + 8)[0]
        dur = struct.unpack_from(">I", data, ps + 4 + 12)[0]
    return ts, dur


def _parse_stsd_video(data: bytes, ps: int, pe: int):
    """First sample entry of stsd: (codec fourcc, width, height).
    VisualSampleEntry layout, 14496-12 §12.1.3."""
    n = struct.unpack_from(">I", data, ps + 4)[0]
    if n < 1:
        return None
    es = ps + 8  # first entry: u32 size, 4cc format
    fmt = data[es + 4:es + 8]
    # 6 reserved + u16 dref + u16 + u16 + 3*u32 pre_defined
    geo = es + 8 + 6 + 2 + 2 + 2 + 12
    if geo + 4 <= pe:
        w, h = struct.unpack_from(">HH", data, geo)
    else:
        w = h = 0
    return fmt.decode("latin1"), w, h


def _table_u32(data: bytes, ps: int, count_off: int) -> np.ndarray:
    n = struct.unpack_from(">I", data, ps + count_off)[0]
    off = ps + count_off + 4
    return np.frombuffer(data, ">u4", count=n, offset=off).astype(np.int64)


def parse_mp4(data: bytes) -> dict:
    """Container metadata (the ExtractMediaMetadata contract): brand,
    movie duration, and per-track handler/codec/dims/sample-count."""
    if data[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF payload (no ftyp)")
    meta: dict = {"tracks": []}
    for fourcc, ps, pe in iter_boxes(data):
        if fourcc == b"ftyp":
            meta["brand"] = data[ps:ps + 4].decode("latin1")
            meta["minor_version"] = struct.unpack_from(">I", data, ps + 4)[0]
            meta["compatible"] = [
                data[o:o + 4].decode("latin1") for o in range(ps + 8, pe, 4)
            ]
        elif fourcc == b"moov":
            for f2, p2, e2 in iter_boxes(data, ps, pe):
                if f2 == b"mvhd":
                    ts, dur = _parse_mvhd(data, p2)
                    meta["timescale"] = ts
                    meta["duration_ms"] = (dur * 1000) // max(ts, 1)
                elif f2 == b"trak":
                    meta["tracks"].append(_parse_trak(data, p2, e2))
    return meta


def _parse_trak(data: bytes, ps: int, pe: int) -> dict:
    tr: dict = {}
    for f, p, e in iter_boxes(data, ps, pe):
        if f == b"tkhd":
            tr["track_id"], tr["width"], tr["height"] = _parse_tkhd(data, p)
        elif f == b"mdia":
            for f2, p2, e2 in iter_boxes(data, p, e):
                if f2 == b"mdhd":
                    tr["media_timescale"], tr["media_duration"] = _parse_mdhd(data, p2)
                elif f2 == b"hdlr":
                    tr["handler"] = data[p2 + 8:p2 + 12].decode("latin1")
                elif f2 == b"minf":
                    stbl = find_box(data, [b"stbl"], p2, e2)
                    if stbl:
                        tr.update(_parse_stbl(data, *stbl))
    return tr


def _parse_stbl(data: bytes, ps: int, pe: int) -> dict:
    out: dict = {}
    for f, p, e in iter_boxes(data, ps, pe):
        if f == b"stsd":
            v = _parse_stsd_video(data, p, e)
            if v:
                out["codec"], out["coded_width"], out["coded_height"] = v
        elif f == b"stsz":
            fixed = struct.unpack_from(">I", data, p + 4)[0]
            n = struct.unpack_from(">I", data, p + 8)[0]
            out["n_samples"] = n
            if fixed:
                out["_sizes"] = np.full(n, fixed, np.int64)
            else:
                out["_sizes"] = np.frombuffer(
                    data, ">u4", count=n, offset=p + 12
                ).astype(np.int64)
        elif f == b"stco":
            out["_chunk_offsets"] = _table_u32(data, p, 4)
        elif f == b"co64":
            n = struct.unpack_from(">I", data, p + 4)[0]
            out["_chunk_offsets"] = np.frombuffer(
                data, ">u8", count=n, offset=p + 8
            ).astype(np.int64)
        elif f == b"stsc":
            n = struct.unpack_from(">I", data, p + 4)[0]
            raw = np.frombuffer(data, ">u4", count=3 * n, offset=p + 8)
            out["_stsc"] = raw.reshape(n, 3).astype(np.int64)
    return out


def sample_spans(track: dict) -> np.ndarray:
    """(n_samples, 2) array of (offset, size) spans into the original
    buffer, from the parsed stbl tables — vectorized stsc expansion
    (14496-12 §8.7.4: entry i applies to chunks
    [first_chunk_i, first_chunk_{i+1}))."""
    sizes = track["_sizes"]
    chunk_off = track["_chunk_offsets"]
    stsc = track["_stsc"]
    n_chunks = len(chunk_off)
    # samples-per-chunk for every chunk
    firsts = stsc[:, 0]          # 1-based
    spc_runs = stsc[:, 1]
    bounds = np.append(firsts, n_chunks + 1)
    reps = np.diff(bounds)
    spc = np.repeat(spc_runs, reps)          # per chunk
    if spc.sum() != len(sizes):
        raise ValueError("stsc/stsz sample count mismatch")
    # chunk index of each sample, then offset within chunk
    chunk_of = np.repeat(np.arange(n_chunks), spc)
    csum = np.concatenate([[0], np.cumsum(sizes)])
    chunk_first = np.concatenate([[0], np.cumsum(spc)])[:-1]
    within = csum[np.arange(len(sizes))] - csum[chunk_first[chunk_of]]
    offs = chunk_off[chunk_of] + within
    return np.stack([offs, sizes], axis=1)


def iter_mp4_video_frames(data: bytes):
    """Yield (frame_idx, rgb_decoder) spans for the first video track.
    ``raw `` (QuickTime uncompressed RGB24) samples decode in-repo;
    any other codec raises loudly AT DECODE TIME, so callers that only
    need spans/counts still work on avc1 files.

    Returns (codec, width, height, spans) where spans is (n, 2)."""
    meta = parse_mp4(data)
    vid = next((t for t in meta["tracks"] if t.get("handler") == "vide"), None)
    if vid is None:
        raise ValueError("no video track")
    # sample GEOMETRY comes from the stsd sample entry (coded dims) —
    # tkhd width/height are DISPLAY dims (scaled/anamorphic matrices,
    # or 0 in some writers) and must not size the pixel buffer
    return (
        vid["codec"],
        vid.get("coded_width", vid["width"]),
        vid.get("coded_height", vid["height"]),
        sample_spans(vid),
    )


def decode_raw_sample(buf: bytes, w: int, h: int) -> np.ndarray:
    """QuickTime 'raw ' video sample: packed big-endian RGB24 rows."""
    a = np.frombuffer(buf, np.uint8, count=h * w * 3)
    return a.reshape(h, w, 3)


# ------------------------------------------------------------- encoder


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _fbox(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, bytes([version]) + flags.to_bytes(3, "big") + payload)


_UNITY_MATRIX = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def encode_mp4_raw_video(
    frames: list[np.ndarray], fps: int = 25, codec_fourcc: bytes = b"raw "
) -> bytes:
    """Deterministic minimal-but-valid mp4: one ``raw `` RGB24 video
    track, samples split into alternating 3/2-sample chunks so the
    stsc → stco mapping is actually exercised (a single-chunk file
    would never catch a chunk-expansion bug). Layout: ftyp, mdat,
    moov — offsets are known before moov is written.

    ``codec_fourcc`` overrides the stsd sample-entry fourcc (payload
    bytes stay raw RGB24): an ``avc1``-labeled container exercises the
    transform-coded decode seam — parsers must read its metadata, and
    sample DECODE must refuse on codec, never sniff bytes. Negative
    fixture for mp4_codec_routing."""
    if len(codec_fourcc) != 4:
        raise ValueError("codec fourcc must be 4 bytes")
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape != (h, w, 3) or f.dtype != np.uint8 for f in frames):
        raise ValueError("all frames must be uint8 (h, w, 3)")
    n = len(frames)
    payloads = [np.ascontiguousarray(f).tobytes() for f in frames]
    sizes = [len(p) for p in payloads]

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mdat = _box(b"mdat", b"".join(payloads))
    mdat_payload_off = len(ftyp) + 8

    # chunking: alternating 3, 2 samples
    spc_list: list[int] = []
    left = n
    while left > 0:
        take = 3 if len(spc_list) % 2 == 0 else 2
        take = min(take, left)
        spc_list.append(take)
        left -= take
    chunk_offsets, stsc_entries = [], []
    si = 0
    for ci, spc in enumerate(spc_list):
        chunk_offsets.append(mdat_payload_off + sum(sizes[:si]))
        if ci == 0 or spc != spc_list[ci - 1]:
            stsc_entries.append((ci + 1, spc, 1))
        si += spc

    dur_media = n                      # one tick per frame at `fps`
    dur_movie = (n * 1000) // fps      # movie timescale 1000

    entry = (
        struct.pack(">I", 86) + codec_fourcc + b"\x00" * 6 + struct.pack(">H", 1)
        + struct.pack(">HH", 0, 0) + b"\x00" * 12
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x480000, 0x480000) + b"\x00" * 4
        + struct.pack(">H", 1) + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
    )
    stsd = _fbox(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _fbox(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _fbox(
        b"stsc", 0, 0,
        struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", *e) for e in stsc_entries),
    )
    stsz = _fbox(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stco = _fbox(
        b"stco", 0, 0,
        struct.pack(">I", len(chunk_offsets))
        + b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _fbox(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _fbox(b"dref", 0, 0, struct.pack(">I", 1) + _fbox(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdhd = _fbox(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, fps, dur_media) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _fbox(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _fbox(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, dur_movie)
        + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0) + _UNITY_MATRIX
        + struct.pack(">II", w << 16, h << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _fbox(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, 1000, dur_movie)
        + struct.pack(">IHH", 0x10000, 0x100, 0) + b"\x00" * 8
        + _UNITY_MATRIX + b"\x00" * 24 + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def is_bmff(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[4:8] == b"ftyp"
