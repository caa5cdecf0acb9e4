"""Bloom-filter decontamination — the 100-TB path for benchmark n-gram
screening (reference concept: DetectDuplicate's DistributedSetCache
membership probe, scaled; the exact-set variant is
``packing.NgramDecontaminator``).

Why: the broadcast-set probe holds every benchmark gram as a Python
string in every actor (~60+ bytes/gram) and hashes per gram per doc in
the interpreter. A corpus-scale benchmark suite (10^8–10^9 grams)
needs ~10 bits/gram instead, and the probe must be a numpy gather, not
a dict walk. ``BloomFilter`` is that: a numpy uint64 bit array with
Kirsch-Mitzenmacher double hashing (k probes derived from one 64-bit
gram hash), built ONCE from the benchmark texts, ``ray.put`` once,
read by every probe actor.

Hashing contract (the no-false-negative guarantee): build and probe
run the IDENTICAL vectorized pipeline — lowercase → alnum-run words
(semantics of ``packing.WORD_RE``) → per-word CRC32 → n-word
splitmix64 chain — so any gram present in the benchmark set always
probes positive. False positives are the usual Bloom trade
(``fp_rate`` sizes the array) plus a vanishing CRC-collision term;
decontamination drops flagged docs, so a false positive costs one
wasted doc, never a leaked benchmark. The whole probe is numpy: one
CRC pass over the flattened word bytes, k strided gathers per gram,
``logical_or.reduceat`` per doc.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util.hashing import crc32_of_strings, mix_u64

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _words_per_doc(texts: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, np.ndarray]:
    """Vectorized WORD_RE tokenization: returns (flat word array,
    words-per-doc lengths). Case folding is Arrow ``utf8_lower`` —
    the ONE fold shared by the exact-set path (packing._folded_pylist)
    and DuckDB's ``lower()``, so bloom / exact / oracle tokenize
    identically even on non-ASCII text (Python str.lower is full case
    mapping and diverges on İ/Σ-final, so it is used on NEITHER side)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lowered = pc.utf8_lower(pc.fill_null(pc.cast(texts, pa.string()), ""))
    pieces = pc.split_pattern_regex(lowered, pattern="[^a-z0-9]+")
    flat = pieces.flatten()
    keep = pc.not_equal(flat, "")
    lens_all = pc.list_value_length(pieces).to_numpy(zero_copy_only=False)
    # count kept (non-empty) words per doc without exploding in Python
    keep_np = keep.to_numpy(zero_copy_only=False)
    starts = np.concatenate(([0], np.cumsum(lens_all)[:-1]))
    kept_per_doc = np.zeros(len(lens_all), np.int64)
    nz = lens_all > 0
    if keep_np.size:
        csum = np.concatenate(([0], np.cumsum(keep_np)))
        kept_per_doc[nz] = (
            csum[(starts + lens_all)[nz]] - csum[starts[nz]]
        )
    return flat.filter(keep), kept_per_doc


def gram_hashes(
    texts: pa.Array | pa.ChunkedArray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """All word n-gram hashes per doc, vectorized. Returns
    ``(hashes u64[G], grams_per_doc int64[D])``; grams never cross doc
    boundaries (docs with < n words contribute zero grams)."""
    words, wlens = _words_per_doc(texts)
    wh = mix_u64(crc32_of_strings(words).astype(np.uint64))
    glens = np.maximum(wlens - n + 1, 0)
    total = int(glens.sum())
    if total == 0:
        return np.empty(0, np.uint64), glens
    # gram g of doc d starts at word_start[d] + g
    wstarts = np.concatenate(([0], np.cumsum(wlens)[:-1]))
    gram_start = np.repeat(wstarts, glens) + (
        np.arange(total) - np.repeat(np.cumsum(glens) - glens, glens)
    )
    h = wh[gram_start]
    for j in range(1, n):
        h = mix_u64(h * _GOLDEN ^ wh[gram_start + j])
    return h, glens


def token_gram_hashes(
    tokens: pa.Array | pa.ChunkedArray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Token-axis twin of ``gram_hashes``: n-token-gram hashes straight
    over the lake's ``tokens list<int32>`` column (no text, no
    tokenizer — decontamination after tokenization compares what the
    model actually trains on). Same splitmix chain, token ids as the
    word hashes."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    lens_f = pc.list_value_length(tokens).to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens_f.astype(np.float64), nan=0.0).astype(np.int64)
    flat = pc.list_flatten(tokens)  # null lists contribute zero elements
    th = mix_u64(flat.to_numpy(zero_copy_only=False).astype(np.uint64))
    glens = np.maximum(lens - n + 1, 0)
    total = int(glens.sum())
    if total == 0:
        return np.empty(0, np.uint64), glens
    tstarts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    gram_start = np.repeat(tstarts, glens) + (
        np.arange(total) - np.repeat(np.cumsum(glens) - glens, glens)
    )
    h = th[gram_start]
    for j in range(1, n):
        h = mix_u64(h * _GOLDEN ^ th[gram_start + j])
    return h, glens


class BloomFilter:
    """Numpy bit-array Bloom filter over u64 hashes."""

    def __init__(self, n_items: int, fp_rate: float = 0.001):
        n_items = max(n_items, 1)
        m = int(np.ceil(-n_items * np.log(fp_rate) / (np.log(2) ** 2)))
        self.m_bits = max(64, (m + 63) // 64 * 64)
        self.k = max(1, int(round(self.m_bits / n_items * np.log(2))))
        self.words = np.zeros(self.m_bits // 64, np.uint64)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        """(k, n) probe bit positions via double hashing."""
        h1 = h
        h2 = mix_u64(h ^ _GOLDEN) | np.uint64(1)
        ks = np.arange(self.k, dtype=np.uint64)[:, None]
        return (h1[None, :] + ks * h2[None, :]) % np.uint64(self.m_bits)

    def add_hashes(self, h: np.ndarray) -> None:
        pos = self._positions(np.asarray(h, np.uint64)).ravel()
        np.bitwise_or.at(
            self.words, (pos >> np.uint64(6)), np.uint64(1) << (pos & np.uint64(63))
        )

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        """Vectorized membership with per-round early exit: probe round
        i only gathers for grams whose first i bits were all set. An
        absent gram dies after ~1/(1-fill) ≈ 2 rounds instead of paying
        all k gathers — at k=30 (fp 1e-9) that is ~15× less memory
        traffic on the absent-dominated traffic decontamination sees."""
        h = np.asarray(h, np.uint64)
        if h.size == 0:
            return np.zeros(0, bool)
        res = np.ones(h.size, bool)
        alive = np.arange(h.size)
        h2 = mix_u64(h ^ _GOLDEN) | np.uint64(1)
        m = np.uint64(self.m_bits)
        for i in range(self.k):
            ha, h2a = h[alive], h2[alive]
            pos = (ha + np.uint64(i) * h2a) % m
            bits = (
                self.words[(pos >> np.uint64(6))] >> (pos & np.uint64(63))
            ) & np.uint64(1)
            dead = bits == 0
            if dead.any():
                res[alive[dead]] = False
                alive = alive[~dead]
                if alive.size == 0:
                    break
        return res

    @property
    def nbytes(self) -> int:
        return self.words.nbytes

    @classmethod
    def build_from_texts(
        cls, texts: pa.Array | list[str], n: int = 5, fp_rate: float = 0.001
    ) -> "BloomFilter":
        """Build from benchmark documents with the probe's own hashing
        pipeline (identical code path = zero false negatives)."""
        arr = pa.array(texts, pa.string()) if not isinstance(
            texts, (pa.Array, pa.ChunkedArray)
        ) else texts
        h, _ = gram_hashes(arr, n)
        uniq = np.unique(h)
        bf = cls(len(uniq), fp_rate)
        bf.add_hashes(uniq)
        return bf


class U64Set:
    """Sorted-unique u64 gram-hash set — the EXACT middle path between
    the broadcast string set (~60+ bytes/gram, Python dict probe) and
    the Bloom filter (~10 bits/gram, fp-rate-bounded drops):

    - 8 bytes/gram flat numpy array (7.5× smaller than strings; the
      shape that still broadcasts at 10^8 grams = 800 MB);
    - probe = one vectorized binary search (``searchsorted`` + a single
      verification gather), no per-gram Python;
    - zero false negatives (same shared ``gram_hashes`` pipeline as the
      Bloom path) and zero structural false positives — the only error
      term is a 64-bit hash collision (expected collisions ≈
      n_corpus_grams × n_bench_grams / 2^64, i.e. ~5e-4 even at 10^8
      grams a side), so unlike Bloom no clean doc is dropped at any
      configured rate.

    Duck-types ``contains_hashes``/``nbytes`` so it drops straight into
    ``BloomDecontaminator``. Prefer this when the benchmark suite fits
    8 bytes/gram in worker heaps; fall back to Bloom beyond that."""

    def __init__(self, hashes: np.ndarray):
        self.sorted = np.unique(np.asarray(hashes, np.uint64))

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        h = np.asarray(h, np.uint64)
        if h.size == 0 or self.sorted.size == 0:
            return np.zeros(h.size, bool)
        idx = np.searchsorted(self.sorted, h)
        idx[idx == self.sorted.size] = self.sorted.size - 1
        return self.sorted[idx] == h

    @property
    def nbytes(self) -> int:
        return self.sorted.nbytes

    @classmethod
    def build_from_texts(
        cls, texts: pa.Array | list[str], n: int = 5
    ) -> "U64Set":
        arr = pa.array(texts, pa.string()) if not isinstance(
            texts, (pa.Array, pa.ChunkedArray)
        ) else texts
        h, _ = gram_hashes(arr, n)
        return cls(h)


class BloomDecontaminator:
    """Actor-pool stage: flag docs sharing ANY word n-gram with the
    benchmark filter. The filter arrives as a ray.put ObjectRef,
    deref'd once per actor, and may be a ``BloomFilter`` OR any object
    duck-typing ``contains_hashes`` (``U64Set`` for the exact 8-B/gram
    path). Same output contract as ``NgramDecontaminator`` (bool
    ``contaminated`` column), superset semantics: every truly
    contaminated doc is flagged; a false positive drops a clean doc at
    the configured ``fp_rate`` (Bloom) or only on a 64-bit hash
    collision (U64Set)."""

    def __init__(
        self,
        bloom,
        col: str = "text",
        n: int = 5,
        out: str = "contaminated",
        mode: str = "text",  # "text" | "tokens" (probe the tokens column)
    ):
        import ray

        if isinstance(bloom, ray.ObjectRef):
            bloom = ray.get(bloom)
        self.bloom: BloomFilter = bloom
        self.col, self.n, self.out = col, n, out
        if mode not in ("text", "tokens"):
            raise ValueError("mode must be 'text' or 'tokens'")
        self.hash_fn = gram_hashes if mode == "text" else token_gram_hashes

    def __call__(self, batch: pa.Table) -> pa.Table:
        h, glens = self.hash_fn(batch[self.col], self.n)
        hits = self.bloom.contains_hashes(h)
        flags = np.zeros(batch.num_rows, bool)
        nz = glens > 0
        if hits.size:
            starts = np.concatenate(([0], np.cumsum(glens)[:-1]))
            flags[nz] = np.logical_or.reduceat(hits, starts[nz])
        return batch.append_column(self.out, pa.array(flags, pa.bool_()))
