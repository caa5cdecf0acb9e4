"""Training-data export stages over the tokens axis: sequence packing
(concat-and-chunk), deterministic corpus shuffle, weighted source
mixing, and benchmark n-gram decontamination.

These are the ops a 100 TB pretraining pipeline runs AFTER curation
(quality gate, dedup) to turn a document lake into training shards.
None exist in the reference (NiFi stops at content routing); they are
first-class here per the training-data-extension mandate.

Scale shapes:

- ``pack_group``: GPT-style concat-and-chunk — concatenate every doc's
  tokens in a deterministic order, slice into fixed-length sequences.
  Runs inside ``groupby(shard_key).map_groups`` so layout is
  deterministic PER GROUP; at corpus scale the group key is the output
  shard (hash range), giving embarrassingly parallel packing with
  per-shard determinism — the property real pipelines settle for,
  since a single global order would serialize the corpus. All math is
  one flatten + one reduceat; the packed list column is rebuilt
  zero-copy from offsets.
- ``shuffle_key`` / ``weighted_mix_filter``: md5-derived uniform hash
  so the DuckDB oracle replays the exact selection byte-for-byte; a
  production swap to ``util.hashing.mix_u64`` (vectorized, ~10x
  cheaper) is one argument — semantics identical.
- ``doc_ngrams`` + ``NgramDecontaminator``: flag documents sharing any
  word n-gram with a benchmark set (the published 13-gram
  train/test-overlap filter; n configurable). The benchmark side is
  the SMALL side: its n-gram set is collected once and broadcast via
  ``ray.put``, the corpus side streams through an actor pool probing
  the set per batch. At 100 TB the set becomes a hashed bloom filter —
  the plumbing (broadcast once, probe per batch) is unchanged.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# words for n-gram decontamination: lowercased alnum runs (simple and
# replayable in DuckDB: regexp_extract_all(lower(text),'[a-z0-9]+'))
WORD_RE = r"[a-z0-9]+"


# ------------------------------------------------------------ packing


def pack_group(max_len: int, order_key: str = "doc_id",
               tokens_col: str = "tokens", keep: tuple[str, ...] = ("lang",)):
    """map_groups fn: concatenate the group's token lists in
    ``order_key`` order and slice into sequences of exactly ``max_len``
    tokens (last one partial). Emits one row per packed sequence:
    ``keep`` columns (constant within the group), ``seq_idx``,
    ``tokens`` (list<int32>), ``n_tok``, ``tok_sum`` (layout
    checksum — pins every token's position for the oracle)."""

    def fn(g: pa.Table) -> pa.Table:
        g = g.sort_by(order_key)
        toks = g[tokens_col]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        n = int(len(flat))
        out_fields = {k: pa.array([], g[k].type) for k in keep}
        if n == 0:
            out_fields.update(
                seq_idx=pa.array([], pa.int64()),
                tokens=pa.array([], pa.list_(pa.int32())),
                n_tok=pa.array([], pa.int64()),
                tok_sum=pa.array([], pa.int64()),
            )
            return pa.table(out_fields)
        n_seq = -(-n // max_len)
        offsets = np.minimum(np.arange(n_seq + 1, dtype=np.int64) * max_len, n)
        seqs = pa.ListArray.from_arrays(
            pa.array(offsets.astype(np.int32)), pa.array(flat.astype(np.int32, copy=False))
        )
        tok_sum = np.add.reduceat(flat.astype(np.int64), offsets[:-1])
        out = {k: pa.array([g[k][0].as_py()] * n_seq, g[k].type) for k in keep}
        out["seq_idx"] = pa.array(np.arange(n_seq, dtype=np.int64))
        out["tokens"] = seqs
        out["n_tok"] = pa.array(np.diff(offsets))
        out["tok_sum"] = pa.array(tok_sum, pa.int64())
        return pa.table(out)

    return fn


# ------------------------------------- deterministic shuffle / mixing


def shuffle_key(col: str, seed: int = 0, out: str = "shuffle_key"):
    """Deterministic shuffle key: md5(value '#' seed) hex. Sorting by it
    is a seeded uniform permutation the SQL oracle reproduces with
    ``md5(concat(col, '#', seed))``. Production: mix_u64 on a hash
    column — same semantics, vectorized."""

    def fn(batch: pa.Table) -> pa.Table:
        suffix = f"#{seed}".encode()
        keys = [
            None if v is None else hashlib.md5(str(v).encode() + suffix).hexdigest()
            for v in batch[col].to_pylist()
        ]
        return batch.append_column(out, pa.array(keys, pa.string()))

    return fn


def weighted_mix_filter(weights: dict[str, float], source_col: str = "source",
                        id_col: str = "doc_id"):
    """Data-mixing sampler: keep a row iff u(doc) < weight(source),
    where u = first-8-hex-digits of md5(str(doc_id)) / 2^32 — a
    deterministic uniform, so the sample is replayable (re-running a
    shard yields the same rows) and SQL-checkable. ``weights`` is the
    small side (a handful of sources), shipped by closure capture —
    use ray.put for big maps (BroadcastEnrich precedent)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        u = np.array(
            [
                int.from_bytes(hashlib.md5(str(v).encode()).digest()[:4], "big")
                for v in ids
            ],
            dtype=np.float64,
        ) / 2.0**32
        w = np.array(
            [weights.get(s, 0.0) for s in batch[source_col].to_pylist()],
            dtype=np.float64,
        )
        return batch.filter(pa.array(u < w))

    return fn


def derived_weight(source: str, buckets: int = 4) -> float:
    """Deterministic per-source weight in {1/b, …, 1}: derived from the
    source NAME (first md5 hex digit), so the oracle recomputes it —
    ``(1 + (first-hex-digit %% b)) / b`` in SQL."""
    return (1 + int(hashlib.md5(source.encode()).hexdigest()[0], 16) % buckets) / buckets


# ------------------------------------------------ decontamination


def doc_ngrams(col: str = "text", n: int = 5, out: str = "ngrams"):
    """Per-doc word n-grams as space-joined strings (list<string>
    column). Words = lowercased alnum runs (WORD_RE). The string form
    (not a hash) is what both sides compare, for oracle parity; the
    scale path hashes each gram to u64 before the set probe."""
    pat = re.compile(WORD_RE)

    def fn(batch: pa.Table) -> pa.Table:
        grams_per_doc = []
        for v in _folded_pylist(batch[col]):
            ws = pat.findall(v)
            grams_per_doc.append(
                [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]
            )
        return batch.append_column(out, pa.array(grams_per_doc, pa.list_(pa.string())))

    return fn


def _folded_pylist(col) -> list[str]:
    """Case-fold a string column EXACTLY as the bloom path and the
    DuckDB oracle do: Arrow utf8_lower (simple per-codepoint mapping,
    verified equal to DuckDB lower() on İ/Σ/ẞ/ǅ edge cases). Python
    str.lower is FULL case mapping ('AİB'.lower() → 'ai̇b') and would
    tokenize differently, so exact-set and bloom decontamination could
    disagree on non-ASCII text if either side used it."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.utf8_lower(pc.fill_null(pc.cast(col, pa.string()), "")).to_pylist()


class NgramDecontaminator:
    """Actor-pool stage: flag documents that share ANY word n-gram with
    a benchmark set. ``bench_grams`` arrives as a ray.put ObjectRef
    (Ray derefs it once per actor in __init__ — broadcast, not
    per-batch reship); the per-batch probe is a set lookup per gram
    with early exit per doc."""

    def __init__(self, bench_grams, col: str = "text", n: int = 5,
                 out: str = "contaminated"):
        import ray

        if isinstance(bench_grams, ray.ObjectRef):  # fn_constructor_args
            bench_grams = ray.get(bench_grams)      # are NOT auto-deref'd
        self.grams = bench_grams if isinstance(bench_grams, (set, frozenset)) else set(bench_grams)
        self.col = col
        self.n = n
        self.out = out
        self.pat = re.compile(WORD_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n, g = self.n, self.grams
        flags = []
        for v in _folded_pylist(batch[self.col]):
            ws = self.pat.findall(v)
            flags.append(
                any(" ".join(ws[i : i + n]) in g for i in range(len(ws) - n + 1))
            )
        return batch.append_column(self.out, pa.array(flags, pa.bool_()))


# ------------------------------------------ weighted reservoir sampling


def weighted_sample_key_fn(w_col: str = "n_chars", id_col: str = "doc_id",
                           k: int = 16):
    """Stateless map_batches body: Efraimidis–Spirakis (2006) weighted
    reservoir keys — key = ln(u)/w with u the repo's deterministic
    md5-uniform (first 8 hex digits, +0.5 to stay strictly inside
    (0,1)); the global top-k by key IS a weighted sample without
    replacement with P(i first) = w_i/Σw. Deterministic and replayable
    (same hash convention as weighted_mix_filter), and SQL-checkable:
    the oracle recomputes the identical key. Keys are emitted as
    micro-ints floor(key·1e9 + 0.5) so the graded ordering is integer
    (ties broken by id — same rule both engines).

    Each batch prunes to its LOCAL top-k before the exchange, so only
    k candidate rows per block reach the final tiny global sort —
    weighted sampling with no corpus shuffle at any scale."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        h = np.array(
            [
                int.from_bytes(hashlib.md5(str(v).encode()).digest()[:4], "big")
                for v in ids
            ],
            dtype=np.float64,
        )
        u = (h + 0.5) / 2.0**32
        w = batch[w_col].to_numpy(zero_copy_only=False).astype(np.float64)
        key = np.floor(np.log(u) / w * 1e9 + 0.5).astype(np.int64)
        out = batch.append_column("key_micro", pa.array(key, pa.int64()))
        if len(out) > k:
            order = np.lexsort((np.asarray(ids), -key))[:k]
            out = out.take(pa.array(np.sort(order)))
        return out

    return fn


# ----------------------------------------------------------------- DSIR


DSIR_B = 4096  # hashed-feature buckets (Xie et al. use 10^4; 4096 keeps
#                the broadcast at 32 KB and collisions are part of the
#                method's contract, not an error)


def dsir_bucket_ids(texts: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(flat bucket ids, words-per-doc lengths) for a text column —
    hashed unigram features: bucket = splitmix(crc32(word)) mod B, on
    the repo's shared word fold (bloom._words_per_doc: utf8_lower +
    ``[^a-z0-9]+`` split, identical on engine and oracle sides)."""
    from ..util.hashing import crc32_of_strings, mix_u64
    from .bloom import _words_per_doc

    words, lens = _words_per_doc(texts)
    if len(words) == 0:
        return np.zeros(0, np.int64), lens
    h = mix_u64(crc32_of_strings(words).astype(np.uint64))
    return (h % np.uint64(DSIR_B)).astype(np.int64), lens


def dsir_count_partials_fn(text_col: str, is_target_col: str):
    """Stateless map_batches body: ONE row per batch with the batch's
    (target, raw) hashed-unigram bucket count vectors — constant 2·B·8
    bytes, never data-sized. ``is_target_col`` is a bool column marking
    rows of the target distribution (e.g. lang == 'en'); raw counts
    cover every row."""

    def fn(batch: pa.Table) -> pa.Table:
        buckets, lens = dsir_bucket_ids(batch[text_col])
        tgt_mask_doc = pc.fill_null(
            pc.cast(batch[is_target_col], pa.bool_()), False
        ).to_numpy(zero_copy_only=False)
        raw = np.bincount(buckets, minlength=DSIR_B).astype(np.int64)
        word_is_tgt = np.repeat(tgt_mask_doc, lens)
        tgt = np.bincount(
            buckets[word_is_tgt], minlength=DSIR_B
        ).astype(np.int64)
        return pa.table(
            {
                "tgt": pa.array([tgt.tolist()], pa.list_(pa.int64())),
                "raw": pa.array([raw.tolist()], pa.list_(pa.int64())),
            }
        )

    return fn


def dsir_log_ratio_micro(tgt: np.ndarray, raw: np.ndarray,
                         alpha: float = 1.0) -> np.ndarray:
    """Per-bucket importance log-ratio log p_tgt(b) − log p_raw(b) with
    Laplace smoothing, as MICRO-INTS (×10⁶, half-away rounding) so the
    per-doc weight is an exact integer sum — the graded ordering never
    rides on libm associativity. One 4096-wide vectorized expression;
    the oracle recomputes it with the identical numpy call."""
    tgt = np.asarray(tgt, np.float64)
    raw = np.asarray(raw, np.float64)
    lt = np.log((tgt + alpha) / (tgt.sum() + alpha * DSIR_B))
    lr = np.log((raw + alpha) / (raw.sum() + alpha * DSIR_B))
    d = (lt - lr) * 1e6
    return (np.sign(d) * np.floor(np.abs(d) + 0.5)).astype(np.int64)


class DsirScore:
    """Actor-pool stage: per-doc DSIR importance weight + Gumbel key.

    weight(doc) = Σ_words lr_micro[bucket(word)] (exact int64 — empty
    docs get 0 via bincount, immune to the trailing-empty reduceat
    class); key = weight + gumbel_micro where gumbel = −ln(−ln(u)) and
    u is the repo's deterministic md5-uniform of the doc id, so
    top-k(key) IS a Gumbel-top-k sample ∝ exp(weight/10⁶) without
    replacement — the published DSIR resampling rule, replayable. The
    micro-int log-ratio table arrives via ray.put, deref'd once per
    actor."""

    def __init__(self, lr_ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        import ray

        self.lr = np.asarray(
            ray.get(lr_ref) if isinstance(lr_ref, ray.ObjectRef) else lr_ref,
            np.int64,
        )
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        buckets, lens = dsir_bucket_ids(batch[self.text_col])
        n = batch.num_rows
        doc_idx = np.repeat(np.arange(n), lens)
        # bincount sums int64 micro-weights exactly (|Σ| << 2^53)
        w = np.bincount(
            doc_idx, weights=self.lr[buckets].astype(np.float64), minlength=n
        ).astype(np.int64)
        ids = batch[self.id_col].to_pylist()
        hu = np.array(
            [int.from_bytes(hashlib.md5(str(v).encode()).digest()[:4], "big")
             for v in ids],
            np.float64,
        )
        u = (hu + 0.5) / 2.0**32
        g = -np.log(-np.log(u)) * 1e6
        g_int = (np.sign(g) * np.floor(np.abs(g) + 0.5)).astype(np.int64)
        return batch.append_column(
            "dsir_w", pa.array(w, pa.int64())
        ).append_column("dsir_key", pa.array(w + g_int, pa.int64()))
