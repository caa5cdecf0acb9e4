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
    return _converge(list(word), ranks)


def _converge(syms: list[str], ranks: dict[tuple[str, str], int]) -> list[str]:
    """Run the lowest-rank-first merge loop to fixpoint from an
    arbitrary symbol state. segment() starts it from characters; the
    incremental trainer restarts it from a previous round's CONVERGED
    state after applying one new merge — correct because convergence
    is a fixpoint property of the state, not of how it was reached:
    lowest-rank-first selection means the from-characters replay under
    the extended rank table makes exactly the old replay's choices
    until the old fixpoint, then continues — i.e. it passes THROUGH
    the old converged state."""
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


def pair_delta_fn(merges: list[tuple[str, str]], new_merge: tuple[str, str]):
    """map_batches body for INCREMENTAL pair-stat maintenance: after a
    merge (l, r) is chosen, only words whose segmentation changes can
    move any pair count, and every such word contains the character
    sequence ``l + r`` (segments are contiguous in-order spans). The
    batch is therefore pre-filtered with ONE vectorized
    pc.match_substring mask — the Python re-segmentation loop runs
    only over the (usually tiny) matched subset, and the emitted rows
    are signed (l, r, delta) partials: -old adjacencies +new
    adjacencies, frequency-weighted. The new segmentation CONTINUES
    the merge loop from the old converged state (_converge — exact by
    the fixpoint argument in its docstring) instead of replaying from
    characters, so the added per-word cost is one continuation, not a
    second full replay (r4 VERDICT ask #5; mirrors subword-nmt's
    sequential incremental update_pair_statistics)."""
    import pyarrow.compute as pc

    ranks_old = {m: i for i, m in enumerate(merges)}
    ranks_new = dict(ranks_old)
    ranks_new[new_merge] = len(merges)
    needle = new_merge[0] + new_merge[1]

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.match_substring(batch["word"], needle))
        cnt: dict[tuple[str, str], int] = {}
        if t.num_rows:
            ns = t["n"].to_numpy(zero_copy_only=False)
            for w, n in zip(t["word"].to_pylist(), ns):
                old = segment(w, ranks_old)
                new = _converge(list(old), ranks_new)
                if old == new:
                    continue
                n = int(n)
                for i in range(len(old) - 1):
                    p = (old[i], old[i + 1])
                    cnt[p] = cnt.get(p, 0) - n
                for i in range(len(new) - 1):
                    p = (new[i], new[i + 1])
                    cnt[p] = cnt.get(p, 0) + n
        cnt = {p: d for p, d in cnt.items() if d}
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


def _collect_pair_stats(words_ds, fn) -> dict[tuple[str, str], int]:
    """Reduce a pair-partial map_batches pass to a driver dict. The
    collected rows are statistics partials (symbol-pair-bounded), never
    corpus data."""
    stats: dict[tuple[str, str], int] = {}
    for row in words_ds.map_batches(fn, batch_format="pyarrow").take_all():
        p = (row["l"], row["r"])
        stats[p] = stats.get(p, 0) + int(row["cnt"])
    return {p: c for p, c in stats.items() if c}


def learn_bpe(words_ds, n_merges: int) -> pa.Table:
    """Learn ``n_merges`` BPE merges from a (word, n) Dataset. Returns
    the merge table (rank 1-based, left, right, freq).

    Incremental statistics (r4 VERDICT ask #5): round 0 runs ONE full
    pair census over the materialized word table; every later round
    ships only a signed delta pass over the words matching the chosen
    merge's character sequence (pair_delta_fn) — O(affected words) of
    Python work per round instead of re-segmenting the whole
    vocabulary, exactly like subword-nmt's sequential
    update_pair_statistics, while the argmax stays a driver-side
    statistics lookup. Property-pinned equal to the full-rescan path
    (learn_bpe_rescan) in tests/test_bpe.py."""
    words_ds = words_ds.materialize()
    merges: list[tuple[str, str]] = []
    rows: list[dict] = []
    stats = _collect_pair_stats(words_ds, pair_partial_fn([]))
    for k in range(n_merges):
        if not stats:
            break
        (left, right), freq = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if freq < 2:
            break
        delta = _collect_pair_stats(words_ds, pair_delta_fn(merges, (left, right)))
        merges.append((left, right))
        rows.append({"rank": k + 1, "left": left, "right": right, "freq": freq})
        for p, d in delta.items():
            v = stats.get(p, 0) + d
            if v:
                stats[p] = v
            else:
                stats.pop(p, None)
        # the chosen pair's own adjacencies are all consumed by the
        # merge, so its delta drives it to exactly 0 — drop defensively
        stats.pop((left, right), None)
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


def learn_bpe_rescan(words_ds, n_merges: int) -> pa.Table:
    """Full-rescan reference path (the pre-r5 learn_bpe): re-segments
    every vocab word each round — O(rounds × vocab). Kept as the
    property-test dual pinning the incremental path's merge table."""
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
