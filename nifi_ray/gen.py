"""Deterministic synthetic data: base table + CDC change-event stream.

Everything is a pure function of (seed, row index) via a splitmix64-style
mixer, so generation is chunk-independent: ``events_table(cfg, a, b)``
returns exactly rows [a, b) of the global stream no matter how the range
is split across Ray tasks. That is what lets the 10^10-event replay be
synthesized as ``ray.data.range(n).map_batches(...)`` with no
coordination (NiFi analog: GenerateFlowFile/DuplicateFlowFile as
synthetic sources, reference
nifi-standard-processors/.../standard/GenerateFlowFile.java).

Skew: doc ids are drawn log-uniformly (Zipf-ish, FIXTURES.md F2), so a
handful of hot doc_ids carry ~10% of events — this exercises the
batch-local pre-merge ahead of the keyed apply.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from .schema import BASE_SCHEMA, EVENT_SCHEMA, MAX_TOKENS, SOURCES, VOCAB_SIZE

_U64 = np.uint64


def mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain construction)."""
    x = x.astype(np.uint64, copy=True)
    x += _U64(0x9E3779B97F4A7C15)
    x ^= x >> _U64(30)
    x *= _U64(0xBF58476D1CE4E5B9)
    x ^= x >> _U64(27)
    x *= _U64(0x94D049BB133111EB)
    x ^= x >> _U64(31)
    return x


def _unit(x: np.ndarray) -> np.ndarray:
    """uint64 → float64 in [0, 1)."""
    return (x >> _U64(11)).astype(np.float64) / float(1 << 53)


@dataclass(frozen=True)
class GenConfig:
    seed: int = 42
    n_docs: int = 1000
    n_events: int = 5000
    lsn_start: int = 1
    # event mix (FIXTURES.md F2): ~20% I / 70% U / 10% D
    p_insert: float = 0.20
    p_delete: float = 0.10
    vocab: int = VOCAB_SIZE
    max_tokens: int = MAX_TOKENS
    # doc ids referenced by events span [0, doc_space) — inserts can
    # create docs absent from the base table.
    doc_space_factor: float = 1.25
    # deterministic empty-row fraction: ~p_empty of row images carry
    # tokens = [] / n_tok = 0 (NOT null — deletes are null). Empties are
    # the input class the r1-r3 fixtures never exercised, which let the
    # clip-reduceat batch-composition hash bug survive three rounds
    # (r3 VERDICT bug #2): a trailing empty-token row must not perturb
    # the preceding row's checksum/signature anywhere in the engine.
    p_empty: float = 0.03
    # schema evolution (FIXTURES.md F4): events with lsn > evolve_after
    # carry an extra `lang` column / widened n_tok.
    evolve_after: int | None = None
    langs: tuple[str, ...] = ("en", "de", "fr", "zh")

    @property
    def doc_space(self) -> int:
        return max(self.n_docs, int(self.n_docs * self.doc_space_factor))


def _doc_ids_from_index(idx: np.ndarray) -> pa.Array:
    return pa.array(np.char.add("doc", np.char.zfill(idx.astype("U10"), 10)))


def _tokens_for_keys(keys: np.ndarray, lengths: np.ndarray, vocab: int) -> pa.Array:
    """list<int32> column: row r gets lengths[r] tokens, each a pure
    function of (keys[r], position). Fully vectorized via repeat/arange."""
    lengths = lengths.astype(np.int64)
    total = int(lengths.sum())
    offsets = np.zeros(len(lengths) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    if total:
        rep_keys = np.repeat(keys, lengths)
        pos = np.arange(total, dtype=np.uint64) - np.repeat(
            (offsets[:-1]).astype(np.uint64), lengths
        )
        vals = (mix64(rep_keys ^ (pos * _U64(0x9E3779B97F4A7C15))) % _U64(vocab)).astype(
            np.int32
        )
    else:
        vals = np.zeros(0, dtype=np.int32)
    return pa.ListArray.from_arrays(pa.array(offsets), pa.array(vals))


def _row_payload(
    cfg: GenConfig,
    doc_key: np.ndarray,
    version_key: np.ndarray,
    force_empty: np.ndarray | None = None,
):
    """(tokens, n_tok, source) for a doc at a given version — the full-row
    image carried by I/U events and by the base table (version 0).
    ``force_empty`` pins specific rows to tokens=[] (tail coverage)."""
    k = mix64(doc_key * _U64(0x632BE59BD9B4E019) ^ version_key)
    lengths = (mix64(k ^ _U64(1)) % _U64(cfg.max_tokens)).astype(np.int64) + 1
    if cfg.p_empty > 0:
        empty = _unit(mix64(k ^ _U64(3))) < cfg.p_empty
        lengths = np.where(empty, 0, lengths)
    if force_empty is not None:
        lengths = np.where(force_empty, 0, lengths)
    tokens = _tokens_for_keys(k, lengths, cfg.vocab)
    n_tok = pa.array(lengths.astype(np.int32))
    src_idx = (mix64(k ^ _U64(2)) % _U64(len(SOURCES))).astype(np.int64)
    source = pa.array(np.asarray(SOURCES, dtype=object)[src_idx].tolist(), type=pa.string())
    return tokens, n_tok, source


def base_table(cfg: GenConfig, start: int = 0, end: int | None = None) -> pa.Table:
    """Rows [start, end) of the deterministic base table."""
    end = cfg.n_docs if end is None else min(end, cfg.n_docs)
    idx = np.arange(start, end, dtype=np.uint64)
    doc_key = mix64(_U64(cfg.seed) ^ (idx * _U64(0xA24BAED4963EE407)))
    # the LAST base doc is always empty: guarantees a trailing-empty row
    # lands at a shard/batch tail somewhere in every e2e run
    force_empty = (idx == cfg.n_docs - 1) if cfg.p_empty > 0 else None
    tokens, n_tok, source = _row_payload(
        cfg, doc_key, np.zeros(len(idx), dtype=np.uint64), force_empty
    )
    return pa.table(
        {
            "doc_id": _doc_ids_from_index(idx),
            "tokens": tokens,
            "n_tok": n_tok,
            "source": source,
        },
        schema=BASE_SCHEMA,
    )


def events_table(cfg: GenConfig, start: int = 0, end: int | None = None) -> pa.Table:
    """Events [start, end) of the global change stream; lsn = lsn_start + i."""
    end = cfg.n_events if end is None else min(end, cfg.n_events)
    i = np.arange(start, end, dtype=np.uint64)
    n = len(i)
    u_doc = _unit(mix64(_U64(cfg.seed) ^ (i * _U64(0x9E3779B97F4A7C15)) ^ _U64(0xD1B54A32D192ED03)))
    # log-uniform (Zipf-ish) doc index over the doc space
    space = cfg.doc_space
    doc_idx = np.minimum(
        (np.exp(u_doc * np.log(space + 1.0)) - 1.0).astype(np.int64), space - 1
    ).astype(np.uint64)
    u_op = _unit(mix64(_U64(cfg.seed) ^ (i * _U64(0x8CB92BA72F3D8DD7)) ^ _U64(5)))
    op_codes = np.where(
        u_op < cfg.p_insert, "I", np.where(u_op < 1.0 - cfg.p_delete, "U", "D")
    )
    lsn = (i + _U64(cfg.lsn_start)).astype(np.int64)

    doc_key = mix64(_U64(cfg.seed) ^ (doc_idx * _U64(0xA24BAED4963EE407)))
    # the row image is a pure function of (doc, lsn) — the "version"
    version_key = mix64(lsn.astype(np.uint64) * _U64(0xE7037ED1A0B428DB))
    tokens, n_tok, source = _row_payload(cfg, doc_key, version_key)

    is_del = op_codes == "D"
    if is_del.any():
        mask = pa.array(~is_del)
        tokens = pa.compute.if_else(mask, tokens, pa.nulls(n, tokens.type))
        n_tok = pa.compute.if_else(mask, n_tok, pa.nulls(n, pa.int32()))
        source = pa.compute.if_else(mask, source, pa.nulls(n, pa.string()))

    cols = {
        "lsn": pa.array(lsn),
        "op": pa.array(op_codes.tolist(), type=pa.string()),
        "doc_id": _doc_ids_from_index(doc_idx),
        "tokens": tokens,
        "n_tok": n_tok,
        "source": source,
    }
    tbl = pa.table(cols, schema=EVENT_SCHEMA)

    if cfg.evolve_after is not None:
        # F4 add_col: events past the evolution point carry `lang`
        lang_idx = (mix64(doc_key ^ _U64(7)) % _U64(len(cfg.langs))).astype(np.int64)
        langs = np.asarray(cfg.langs, dtype=object)[lang_idx]
        evolved = lsn > cfg.evolve_after
        lang_vals = [str(l) if (e and not d) else None for l, e, d in zip(langs, evolved, is_del)]
        tbl = tbl.append_column("lang", pa.array(lang_vals, type=pa.string()))
    return tbl


def write_parquet_sharded(
    table_fn, cfg: GenConfig, n_rows: int, out_dir: str, shards: int, prefix: str
) -> list[str]:
    """Write rows [0, n_rows) as `shards` deterministic parquet files.
    Atomic per file (tmp + rename) and skip-if-exists, so concurrent or
    repeated callers converge on identical bytes."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    bounds = np.linspace(0, n_rows, shards + 1).astype(int)
    for s in range(shards):
        path = os.path.join(out_dir, f"{prefix}-{s:05d}.parquet")
        paths.append(path)
        if os.path.exists(path):
            continue
        tbl = table_fn(cfg, int(bounds[s]), int(bounds[s + 1]))
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
    return paths


def write_base(cfg: GenConfig, out_dir: str, shards: int = 4) -> list[str]:
    return write_parquet_sharded(base_table, cfg, cfg.n_docs, out_dir, shards, "base")


def write_events(cfg: GenConfig, out_dir: str, shards: int = 8) -> list[str]:
    return write_parquet_sharded(events_table, cfg, cfg.n_events, out_dir, shards, "events")
