"""Distributed byte-pair-encoding merge training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"; counting
and merge-application semantics match the public subword-nmt trainer:
adjacent pairs counted at every position, the winning pair merged
left-to-right non-overlapping, ties broken by lexicographically
smallest (left, right)).

Scale shape — why this is NOT the sequential dict algorithm:

1. ONE corpus pass collapses documents to the (word, n) frequency
   table via per-batch Arrow group_by partials + a combiner groupby.
   The output is |distinct words| rows — orders of magnitude smaller
   than the corpus — and every later round touches only this table
   (materialized once, reused across rounds).
2. Each merge round is a map_batches pair-count over the word table
   emitting O(|symbols|^2)-bounded partial rows (the symbol set grows
   by exactly one per round), so collecting the partials on the driver
   is collecting statistics, never data.
3. The chosen merge is broadcast into the next round's map_batches
   closure; each word is re-segmented by lowest-rank-first replay,
   which is provably identical to in-order sequential application
   (a merge can never create an occurrence of a lower-rank pair,
   since at least one side of any new adjacency is the just-created
   symbol).
"""

from __future__ import annotations

import re

import pyarrow as pa

from .packing import WORD_RE, _folded_pylist


def word_counts(ds, col: str = "text"):
    """documents Dataset → (word, n) frequency Dataset. Words are
    lowercased alnum runs (same fold as the decontamination family:
    Arrow utf8_lower). Per-batch Arrow group_by collapses repeats
    before the one word-key exchange."""
    from .aggregate import pre_aggregate

    pat = re.compile(WORD_RE)

    def partial(batch: pa.Table) -> pa.Table:
        words: list[str] = []
        for v in _folded_pylist(batch[col]):
            words.extend(pat.findall(v))
        if not words:
            return pa.table(
                {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        t = pa.table({"word": pa.array(words, pa.string())})
        g = t.group_by("word").aggregate([([], "count_all")])
        return g.rename_columns(["word", "n"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return pre_aggregate(partials, "word", {"n": ("n", "sum")})


def segment(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment one word by replaying learned merges lowest-rank-first,
    merging all non-overlapping occurrences left-to-right (the GPT-2
    style application, equivalent to in-order replay — see module
    docstring)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        left, right = best_pair
        merged = left + right
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == left and syms[i + 1] == right:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def pair_partial_fn(merges: list[tuple[str, str]]):
    """map_batches body over the (word, n) table: segment each distinct
    word under the merges learned so far and emit frequency-weighted
    adjacent-pair partial counts (l, r, cnt). The Python loop here runs
    over DISTINCT WORDS (the collapsed table), never corpus rows."""
    ranks = {m: i for i, m in enumerate(merges)}

    def fn(batch: pa.Table) -> pa.Table:
        words = batch["word"].to_pylist()
        ns = batch["n"].to_numpy(zero_copy_only=False)
        cnt: dict[tuple[str, str], int] = {}
        for w, n in zip(words, ns):
            syms = segment(w, ranks)
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                cnt[p] = cnt.get(p, 0) + int(n)
        if not cnt:
            return pa.table(
                {
                    "l": pa.array([], pa.string()),
                    "r": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        ls, rs = zip(*cnt.keys())
        return pa.table(
            {
                "l": pa.array(list(ls), pa.string()),
                "r": pa.array(list(rs), pa.string()),
                "cnt": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    return fn


def learn_bpe(words_ds, n_merges: int) -> pa.Table:
    """Learn ``n_merges`` BPE merges from a (word, n) Dataset. Returns
    the merge table (rank 1-based, left, right, freq). Each round: one
    streaming pass over the materialized word table producing bounded
    pair partials, reduced with ONE Arrow group_by on the driver
    (statistics, not data), argmax with (freq desc, (l, r) asc)
    tie-break, stop early if no pair repeats."""
    words_ds = words_ds.materialize()
    merges: list[tuple[str, str]] = []
    rows: list[dict] = []
    for k in range(n_merges):
        partial = words_ds.map_batches(
            pair_partial_fn(merges), batch_format="pyarrow"
        )
        stats = pa.Table.from_pylist(
            partial.take_all(),
            schema=pa.schema(
                [("l", pa.string()), ("r", pa.string()), ("cnt", pa.int64())]
            ),
        )
        if stats.num_rows == 0:
            break
        g = stats.group_by(["l", "r"]).aggregate([("cnt", "sum")])
        ls = g["l"].to_pylist()
        rs = g["r"].to_pylist()
        cs = g["cnt_sum"].to_numpy(zero_copy_only=False)
        best = min(
            range(len(ls)), key=lambda i: (-int(cs[i]), ls[i], rs[i])
        )
        if int(cs[best]) < 2:
            break
        merges.append((ls[best], rs[best]))
        rows.append(
            {
                "rank": k + 1,
                "left": ls[best],
                "right": rs[best],
                "freq": int(cs[best]),
            }
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("rank", pa.int64()),
                ("left", pa.string()),
                ("right", pa.string()),
                ("freq", pa.int64()),
            ]
        ),
    )


class BpeEncoder:
    """Actor-pool stage: segment every document with a learned merge
    table and stamp the BPE token count. The rank dict and regex are
    built once per actor; per-word segmentations are memoized across
    batches (the memo is vocab-bounded — distinct words, not corpus
    rows). The corpus pass is embarrassingly parallel: merges are tiny
    constructor state, shipped once per actor, never per batch."""

    def __init__(
        self,
        merges: list[tuple[str, str]],
        col: str = "text",
        out: str = "n_bpe_tokens",
    ):
        self._ranks = {tuple(m): i for i, m in enumerate(merges)}
        self._pat = re.compile(WORD_RE)
        self._memo: dict[str, int] = {}
        self._col, self._out = col, out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ns = []
        for v in _folded_pylist(batch[self._col]):
            tot = 0
            for w in self._pat.findall(v):
                n = self._memo.get(w)
                if n is None:
                    n = len(segment(w, self._ranks))
                    self._memo[w] = n
                tot += n
            ns.append(tot)
        return batch.append_column(self._out, pa.array(ns, pa.int64()))
