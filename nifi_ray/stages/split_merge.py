"""Fan-out / fan-in of content — SplitText and MergeContent semantics.

- ``split_column`` explodes one row into many (SplitText / SplitJson /
  SegmentContent analogs: reference
  nifi-standard-processors/.../standard/SplitText.java, SplitJson.java),
  stamping the same ``fragment.*`` bookkeeping NiFi uses as the
  split→merge contract (reference MergeContent.java:97-132):
  fragment_id (parent key), fragment_index, fragment_count.

- ``defragment`` reassembles exactly fragment_count pieces per
  fragment_id in fragment_index order — MergeContent's Defragment
  strategy (reference MergeContent.java:140-147; bin logic
  nifi-processor-utilities/.../bin/BinManager.java:119-205). Incomplete
  groups route to 'failure' like NiFi's expired bins.

Implemented as vectorized explode (no Python row loop: Arrow list
flatten + numpy repeat) and ``groupby(fragment_id).map_groups``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def split_text(
    col: str,
    pattern: str = r"\s+",
    out: str = "token",
    keep_empty: bool = False,
    fragments: bool = False,
):
    """map_batches body: explode a string column by regex into one row
    per piece, repeating the other columns (vectorized)."""

    def fn(batch: pa.Table) -> pa.Table:
        pieces = pc.split_pattern_regex(batch[col], pattern=pattern)
        lens = pc.list_value_length(pieces).to_numpy(zero_copy_only=False)
        flat = pieces.combine_chunks().flatten() if isinstance(
            pieces, pa.ChunkedArray
        ) else pieces.flatten()
        parent_idx = np.repeat(np.arange(batch.num_rows), lens)
        others = batch.take(pa.array(parent_idx))
        out_tbl = others.append_column(out, flat)
        if fragments:
            frag_index = np.arange(len(parent_idx)) - np.repeat(
                np.cumsum(lens) - lens, lens
            )
            out_tbl = out_tbl.append_column(
                "fragment_index", pa.array(frag_index.astype(np.int32))
            )
            out_tbl = out_tbl.append_column(
                "fragment_count",
                pa.array(np.repeat(lens, lens).astype(np.int32)),
            )
        if not keep_empty:
            out_tbl = out_tbl.filter(pc.not_equal(out_tbl[out], ""))
        return out_tbl

    return fn


def segment_content(
    col: str = "content",
    segment_size: int = 1 << 20,
    out: str = "segment",
):
    """SegmentContent.java analog: explode a binary column into
    fixed-size byte segments with the ``fragment.*`` split→merge
    contract (the reference stamps segment.original.filename +
    fragment id/index/count; reassembly is MergeContent Defragment =
    ``defragment_fn``). Each output byte is copied exactly once
    (memoryview slices); the loop is over segments, not bytes."""

    def fn(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_pylist()
        lens = np.array([0 if v is None else len(v) for v in vals], np.int64)
        nseg = np.maximum((lens + segment_size - 1) // segment_size, 1)
        parent_idx = np.repeat(np.arange(batch.num_rows), nseg)
        pieces, frag_idx = [], []
        for v, n in zip(vals, nseg):
            if v is None:
                pieces.append(None), frag_idx.append(0)
                continue
            mv = memoryview(v)
            for i in range(n):
                pieces.append(bytes(mv[i * segment_size : (i + 1) * segment_size]))
                frag_idx.append(i)
        return (
            batch.take(pa.array(parent_idx))
            .append_column(out, pa.array(pieces, pa.binary()))
            .append_column(
                "fragment_index", pa.array(np.array(frag_idx, np.int32))
            )
            .append_column(
                "fragment_count",
                pa.array(np.repeat(nseg, nseg).astype(np.int32)),
            )
        )

    return fn


def split_content(
    col: str = "content",
    byte_sequence: bytes = b"\n",
    keep: str | None = None,  # None | "trailing" | "leading"
    out: str = "piece",
    keep_empty: bool = False,
):
    """SplitContent.java analog: explode a binary column on an
    arbitrary byte sequence. ``keep`` mirrors the reference's Keep Byte
    Sequence + Byte Sequence Location properties: ``"trailing"``
    re-attaches the delimiter to the piece before it, ``"leading"`` to
    the piece after it, ``None`` drops it. Same fragment contract as
    ``segment_content``."""
    if keep not in (None, "trailing", "leading"):
        raise ValueError("keep must be None, 'trailing' or 'leading'")

    def fn(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_pylist()
        all_pieces: list[list[bytes] | None] = []
        for v in vals:
            if v is None:
                all_pieces.append(None)
                continue
            parts = bytes(v).split(byte_sequence)
            if keep == "trailing":
                parts = [
                    p + byte_sequence if i < len(parts) - 1 else p
                    for i, p in enumerate(parts)
                ]
            elif keep == "leading":
                parts = [
                    byte_sequence + p if i > 0 else p for i, p in enumerate(parts)
                ]
            if not keep_empty:
                parts = [p for p in parts if p] or [b""]
            all_pieces.append(parts)
        nseg = np.array(
            [1 if p is None else len(p) for p in all_pieces], np.int64
        )
        parent_idx = np.repeat(np.arange(batch.num_rows), nseg)
        flat = [
            piece
            for parts in all_pieces
            for piece in (parts if parts is not None else [None])
        ]
        frag_idx = np.concatenate([np.arange(n) for n in nseg]) if len(nseg) else []
        return (
            batch.take(pa.array(parent_idx))
            .append_column(out, pa.array(flat, pa.binary()))
            .append_column(
                "fragment_index", pa.array(np.asarray(frag_idx, np.int32))
            )
            .append_column(
                "fragment_count",
                pa.array(np.repeat(nseg, nseg).astype(np.int32)),
            )
        )

    return fn


def defragment_fn(
    piece_col: str,
    id_col: str = "fragment_id",
    index_col: str = "fragment_index",
    count_col: str = "fragment_count",
    sep: str = "",
    out: str = "merged",
):
    """map_groups body (group = all pieces of one fragment_id): emit one
    merged row, or route to failure if pieces are missing/extra."""

    def fn(group: pa.Table) -> pa.Table:
        g = group.sort_by(index_col)
        expected = g[count_col][0].as_py()
        idx = g[index_col].to_pylist()
        complete = len(g) == expected and idx == list(range(expected))
        merged = sep.join(v.as_py() for v in g[piece_col]) if complete else None
        return pa.table(
            {
                id_col: [g[id_col][0].as_py()],
                out: pa.array([merged], pa.string()),
                "n_frags": pa.array([len(g)], pa.int64()),
                "relationship": ["merged" if complete else "failure"],
            }
        )

    return fn


def bin_pack_fn(
    key: str,
    order: str,
    size_col: str | None = None,
    min_entries: int = 1,
    max_entries: int | None = None,
    min_size: int | None = None,
    max_size: int | None = None,
    piece_col: str | None = None,
    sep: str = "",
):
    """map_groups body: MergeContent's Bin-Packing strategy (reference
    nifi-standard-processors/.../standard/MergeContent.java:140-147; bin
    fill/flush logic nifi-processor-utilities/.../bin/BinManager.java:119-205).

    One group = one correlation-key's records, packed in ``order`` into
    bins greedily: a bin closes when adding the next record would exceed
    ``max_entries`` or ``max_size``. A bin meeting ``min_entries`` and
    ``min_size`` routes to 'merged'; the trailing bin that never reached
    the minimums routes to 'partial' — the batch boundary plays NiFi's
    max-bin-age flush (in a batch replay, end-of-input IS the age-out).

    Emits one row per bin: key, bin_id, n_items, total_size, optional
    concatenated payload, relationship. Boundary search is a single
    O(n) pass over the group's numpy size vector.
    """

    def fn(group: pa.Table) -> pa.Table:
        g = group.sort_by(order)
        n = g.num_rows
        sizes = (
            g[size_col].to_numpy(zero_copy_only=False).astype(np.int64)
            if size_col
            else np.ones(n, dtype=np.int64)
        )
        bin_ids = np.zeros(n, dtype=np.int64)
        b = 0
        cnt = 0
        tot = 0
        for i in range(n):  # greedy boundaries: inherently sequential scan
            over = (max_entries is not None and cnt + 1 > max_entries) or (
                max_size is not None and cnt > 0 and tot + sizes[i] > max_size
            )
            if over:
                b += 1
                cnt, tot = 0, 0
            bin_ids[i] = b
            cnt += 1
            tot += sizes[i]
        n_bins = b + 1
        counts = np.bincount(bin_ids, minlength=n_bins)
        size_sums = np.bincount(bin_ids, weights=sizes, minlength=n_bins).astype(
            np.int64
        )
        ok = counts >= min_entries
        if min_size is not None:
            ok &= size_sums >= min_size
        cols = {
            key: pa.array([g[key][0].as_py()] * n_bins, g[key].type),
            "bin_id": pa.array(np.arange(n_bins), pa.int64()),
            "n_items": pa.array(counts.astype(np.int64)),
            "total_size": pa.array(size_sums),
            "relationship": pa.array(
                ["merged" if o else "partial" for o in ok], pa.string()
            ),
        }
        if piece_col is not None:
            pieces = g[piece_col].to_pylist()
            merged = [
                sep.join(
                    "" if pieces[i] is None else str(pieces[i])
                    for i in np.flatnonzero(bin_ids == bid)
                )
                for bid in range(n_bins)
            ]
            cols["merged"] = pa.array(merged, pa.string())
        return pa.table(cols)

    return fn


def bin_pack(ds, key: str, order: str, **kwargs):
    """Dataset-level bin packing: groupby(correlation key) → per-group
    greedy packing. The shuffle carries records once; bins never span
    keys (MergeContent bins by Correlation Attribute the same way)."""
    return ds.groupby(key).map_groups(
        bin_pack_fn(key, order, **kwargs), batch_format="pyarrow"
    )


def merge_ordered(ds, key: str, order: str, piece_col: str, sep: str, out: str = "merged"):
    """Bin-packing-lite: concatenate ``piece_col`` per ``key`` in
    ``order`` order (MergeContent with Correlation Attribute; ordering
    via per-group sort replaces queue prioritizers, SURVEY.md §2.8)."""

    def fn(group: pa.Table) -> pa.Table:
        g = group.sort_by(order)
        return pa.table(
            {
                key: [g[key][0].as_py()],
                out: [sep.join("" if v is None else str(v) for v in g[piece_col].to_pylist())],
                "n_frags": pa.array([len(g)], pa.int64()),
            }
        )

    return ds.groupby(key).map_groups(fn, batch_format="pyarrow")
