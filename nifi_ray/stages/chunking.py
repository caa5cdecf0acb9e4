"""Content-defined chunking (Gear rolling hash, FastCDC family).

The storage-dedup backbone operator: split byte streams at positions
where a rolling hash of the trailing window hits a mask, so chunk
boundaries are a function of CONTENT, not offset. An insertion near the
front of a document shifts every fixed-offset segment (reference
SegmentContent — nifi-standard-processors/.../SegmentContent.java —
cuts at fixed byte offsets, so one inserted byte re-writes every
downstream chunk) but content-defined boundaries re-align at the first
common cut, so only O(edit) chunks change — the property that makes
chunk-level dedup work at archive scale.

Public algorithm: Gear hash (Xia et al., "FastCDC: a Fast and Efficient
Content-Defined Chunking Approach for Data Deduplication", USENIX ATC
2016): h_i = (h_{i-1} << 1) + G[b_i] over a random byte table G; with a
32-bit h the window is the trailing 32 bytes. Cut after position i when
(h_i & mask) == 0, subject to min/max chunk sizes.

Vectorization: h_i depends only on the last 32 bytes, so the whole
rolling-hash array is a 32-term shifted table-lookup sum — computed for
an entire flattened batch of documents in 32 numpy vector ops, with a
validity mask keeping windows from crossing document boundaries. The
only sequential work is walking the (sparse) candidate-cut list per
document to enforce min/max sizes — O(chunks), not O(bytes).

Determinism: cuts are a pure per-document function of the bytes; batch
composition cannot change them (each document's candidate positions are
computed from its own bytes only).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["gear_candidates", "chunk_spans", "chunk_doc_fn", "chunk_flat_fn"]

_WINDOW = 32  # 32-bit gear hash → trailing-32-byte window

MIN_SIZE = 24
AVG_BITS = 6  # mask of 6 bits → ~1/64 cut probability ≈ 64 B avg chunks
MAX_SIZE = 256


def _gear_table() -> np.ndarray:
    """256 uint32 entries from splitmix64 (public constant-seeded PRNG;
    same generator the repo's hashing chain uses)."""
    x = np.uint64(0x9E3779B97F4A7C15)
    out = np.empty(256, np.uint64)
    state = np.uint64(0xC0FFEE_CDC_C0FFEE % (1 << 64))
    with np.errstate(over="ignore"):
        for i in range(256):
            state = state + x
            z = state
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            out[i] = z ^ (z >> np.uint64(31))
    return (out & np.uint64(0xFFFFFFFF)).astype(np.uint32)


_GEAR = _gear_table()


def gear_candidates(
    flat: np.ndarray, doc_starts: np.ndarray, mask: int
) -> np.ndarray:
    """Candidate cut positions over a FLATTENED uint8 byte array holding
    many documents back-to-back (``doc_starts`` = start offset of each
    document). Returns flat indices i where (h_i & mask)==0 AND the
    trailing 32-byte window lies inside i's own document (positions
    with in-doc index < WINDOW-1 are never candidates — the warmup).
    A cut at flat index i means "end the chunk after byte i"."""
    n = flat.size
    if n == 0:
        return np.empty(0, np.int64)
    g = _GEAR[flat]
    acc = np.zeros(n, np.uint32)
    with np.errstate(over="ignore"):
        for j in range(min(_WINDOW, n)):
            # contribution of byte i-j enters shifted left by j
            acc[j:] += g[: n - j] << np.uint32(j)
    hits = (acc & np.uint32(mask)) == 0
    # invalidate warmup positions at the head of every document
    pos = np.arange(n, dtype=np.int64)
    doc_of = np.searchsorted(doc_starts, pos, side="right") - 1
    in_doc = pos - doc_starts[doc_of]
    hits &= in_doc >= _WINDOW - 1
    return np.flatnonzero(hits)


def chunk_spans(
    data: bytes | np.ndarray,
    min_size: int = MIN_SIZE,
    avg_bits: int = AVG_BITS,
    max_size: int = MAX_SIZE,
) -> list[tuple[int, int]]:
    """Chunk ONE document: [start, end) spans covering the bytes.
    Candidate cuts from the gear hash; a cut is taken when the chunk
    would reach min_size, a hard cut is forced at max_size, the final
    chunk may be shorter than min_size."""
    buf = np.frombuffer(data, np.uint8) if isinstance(data, bytes) else data
    cands = gear_candidates(buf, np.zeros(1, np.int64), (1 << avg_bits) - 1)
    return _spans_from_candidates(int(buf.size), cands, 0, min_size, max_size)


def _spans_from_candidates(
    n: int, cands: np.ndarray, base: int, min_size: int, max_size: int
) -> list[tuple[int, int]]:
    """Walk sparse candidate cut positions (flat indices, document
    occupying [base, base+n)) enforcing min/max chunk sizes."""
    spans = []
    last = 0  # in-doc offset
    ends = cands - base + 1  # candidate chunk-end offsets, sorted
    i = 0
    while last < n:
        hard = min(last + max_size, n)
        # first candidate end giving a chunk of at least min_size
        i = int(np.searchsorted(ends, last + min_size, side="left"))
        cut = hard
        if i < ends.size and ends[i] <= hard:
            cut = int(ends[i])
        spans.append((last, cut))
        last = cut
    return spans


def _doc_chunks_table(texts, doc_ids, min_size, avg_bits, max_size):
    """Shared batch kernel: flatten → one vectorized candidate pass →
    per-doc span walk. Returns (doc_ids, list-of-(start,end) per doc,
    flat bytes, doc_starts)."""
    bufs = [t.encode("utf-8") if isinstance(t, str) else t for t in texts]
    lens = np.array([len(b) for b in bufs], np.int64)
    doc_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    flat = (
        np.frombuffer(b"".join(bufs), np.uint8)
        if bufs
        else np.empty(0, np.uint8)
    )
    cands = gear_candidates(flat, doc_starts, (1 << avg_bits) - 1)
    per_doc = []
    for d in range(len(bufs)):
        lo, hi = doc_starts[d], doc_starts[d] + lens[d]
        dc = cands[np.searchsorted(cands, lo): np.searchsorted(cands, hi)]
        per_doc.append(
            _spans_from_candidates(int(lens[d]), dc, int(lo), min_size, max_size)
        )
    return per_doc, flat, doc_starts


def chunk_doc_fn(
    text_col: str = "text",
    id_col: str = "doc_id",
    min_size: int = MIN_SIZE,
    avg_bits: int = AVG_BITS,
    max_size: int = MAX_SIZE,
):
    """map_batches fn → per-document chunking summary: n_chunks,
    max_chunk_len, and chunk_sig = first 16 hex of blake2b over the
    concatenated per-chunk blake2b-8 digests (order-sensitive per-doc
    signature both engines compute sequentially)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        spans, flat, starts = _doc_chunks_table(
            texts, None, min_size, avg_bits, max_size
        )
        n_chunks, max_len, sigs = [], [], []
        for d, sp in enumerate(spans):
            base = int(starts[d])
            digests = b"".join(
                hashlib.blake2b(
                    flat[base + s: base + e].tobytes(), digest_size=8
                ).digest()
                for s, e in sp
            )
            n_chunks.append(len(sp))
            max_len.append(max((e - s for s, e in sp), default=0))
            sigs.append(hashlib.blake2b(digests, digest_size=8).hexdigest())
        return pa.table(
            {
                "doc_id": batch[id_col],
                "n_chunks": pa.array(n_chunks, pa.int64()),
                "max_chunk_len": pa.array(max_len, pa.int64()),
                "chunk_sig": pa.array(sigs, pa.string()),
            }
        )

    return fn


def chunk_flat_fn(
    text_col: str = "text",
    min_size: int = MIN_SIZE,
    avg_bits: int = AVG_BITS,
    max_size: int = MAX_SIZE,
):
    """map_batches fn → one row per UNIQUE chunk seen in the batch
    (chunk_hash hex-16, chunk_len, occurrences in batch) — the partial a
    chunk-store dedup aggregates by hash downstream. Emitting per-batch
    uniques keeps the exchange proportional to distinct chunks, not
    total chunks."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        spans, flat, starts = _doc_chunks_table(
            texts, None, min_size, avg_bits, max_size
        )
        agg: dict[str, list[int]] = {}
        for d, sp in enumerate(spans):
            base = int(starts[d])
            for s, e in sp:
                h = hashlib.blake2b(
                    flat[base + s: base + e].tobytes(), digest_size=8
                ).hexdigest()
                if h in agg:
                    agg[h][1] += 1
                else:
                    agg[h] = [e - s, 1]
        return pa.table(
            {
                "chunk_hash": pa.array(list(agg.keys()), pa.string()),
                "chunk_len": pa.array(
                    [v[0] for v in agg.values()], pa.int64()
                ),
                "occurrences": pa.array(
                    [v[1] for v in agg.values()], pa.int64()
                ),
            }
        )

    return fn
