"""Incrementally-maintained IVF ANN index over a CDCLake.

The batch ANN path (stages/similarity.py → ★knn_cosine, ☆knn_ivf)
answers "nearest neighbors in this corpus" with a full-corpus pass (or
a fresh IVF build) per run. With a CDC stream on top of the corpus the
right cost class is the dedup_index one: keep the IVF cell lists as
LAKE STATE and patch them O(changed docs) per tick, so similarity
search over a living corpus costs

    refresh:  O(changed docs)        (manifest-diff pruning; suffix-
                                      shaped spans read only appended
                                      delta files + point reads)
    search:   O(nprobe/n_cells of corpus)  (probe only the cells the
                                      query vector is closest to)

Embeddings are a deterministic seeded projection of the lake's token
ids (splitmix64 per (token, dim) → [-1, 1), summed over the doc in
token order, L2-normalized). That makes the WHOLE index a pure
function of lake state — no model weights, fully replayable by the
scalar oracle (oracle_expected.expected_ann_search re-derives the same
floats from python-int hashing + the same numpy float math).

Index layout (under the lake root, versioned like the dedup index):

    _indexes/{name}/spec.json                   dim / n_cells / seed
    _indexes/{name}/centroids.parquet           coarse quantizer — an
        input CONSTANT after creation (kmeans_lite over the creation
        version's lexicographically-first `sample` docs)
    _indexes/{name}/idx_v{V:06d}.json           manifest per reflected
                                                lake version V
    _indexes/{name}/c={C:04d}/{part,delta}-v{V:06d}.parquet
        cell files of (doc_id, emb_hash, emb, sign) rows; cell C =
        argmax centroid · embedding. Base files hold +1 rows; delta
        patches hold ±1 (−1 removes that exact (doc, emb_hash) row).
        Cell state = rows whose net sign per (doc, emb_hash) is > 0 —
        an update's −old/+new pair replaces the embedding without
        rewriting the cell base (merge-on-read, compacted past
        ``max_deltas``, the same policy as the lake itself).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..state.manifest import publish_part
from .dedup_index import _dir, _publish, index_versions

_IDX_RE_NAME = "ann"

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_D1 = np.uint64(0xD6E8FEB86659FD93)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (same public construction as gen.mix64;
    duplicated here so the index does not import the test generator)."""
    x = x.astype(np.uint64, copy=True)
    x += _GOLD
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def token_embeddings(
    doc_ids: pa.Array, tokens: pa.ChunkedArray | pa.Array, dim: int, seed: int
) -> np.ndarray:
    """(n_docs, dim) float64 unit embeddings from token-id lists.

    For dim j and token t: h = mix64(t·GOLD ⊕ mix64(seed·D1 ⊕ j)),
    value = h/2^53 (top 53 bits) · 2 − 1 ∈ [−1, 1); doc vector = sum
    over its tokens IN ORDER (reduceat — sequential left-to-right, so
    the scalar oracle's running sum is bit-identical), then L2
    normalization. Empty docs embed to the zero vector."""
    toks = tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens
    flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    # null token lists surface as NaN lengths — treat as empty docs
    lens = np.nan_to_num(
        pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.float64),
        nan=0.0,
    ).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    n = len(lens)
    out = np.zeros((n, dim), dtype=np.float64)
    # reduceat only over NON-EMPTY segments: an empty list followed by no
    # further tokens has start == flat.size, and clipping it backward would
    # truncate the previous doc's segment, making embeddings depend on batch
    # composition (breaking the "index is a pure function of lake state"
    # invariant). Scatter per-segment sums into the zero matrix instead.
    nz = lens > 0
    for j in range(dim):
        # uint64 wraparound is the intended arithmetic (numpy warns on
        # scalar overflow only; the array ops below wrap silently)
        with np.errstate(over="ignore"):
            cj = _mix64(np.array([np.uint64(seed) * _D1 ^ np.uint64(j)], np.uint64))[0]
        h = _mix64(flat * _GOLD ^ cj)
        vals = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53) * 2.0 - 1.0
        if flat.size and nz.any():
            out[nz, j] = np.add.reduceat(vals, starts[nz])
    norms = np.linalg.norm(out, axis=1)
    nz = norms > 1e-12
    out[nz] = out[nz] / norms[nz, None]
    return out


def _emb_hash(emb: np.ndarray) -> np.ndarray:
    """uint64 content hash per row of a float64 matrix (bit pattern →
    mix64 → XOR-reduce) — the exact-removal key for patch rows."""
    bits = _mix64(emb.view(np.uint64).reshape(emb.shape))
    h = np.bitwise_xor.reduce(
        bits ^ (np.arange(emb.shape[1], dtype=np.uint64) * _D1), axis=1
    )
    return h


def _rows_schema(dim: int) -> pa.Schema:
    return pa.schema(
        [
            pa.field("doc_id", pa.string()),
            pa.field("emb_hash", pa.uint64()),
            pa.field("emb", pa.list_(pa.float64(), dim)),
            pa.field("sign", pa.int8()),
        ]
    )


def _make_rows(t: pa.Table, spec: dict, sign: int) -> pa.Table:
    """Signed index rows for a state slice."""
    dim = spec["dim"]
    if t.num_rows == 0:
        return _rows_schema(dim).empty_table()
    emb = token_embeddings(t["doc_id"], t["tokens"], dim, spec["seed"])
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "emb_hash": pa.array(_emb_hash(emb)),
            "emb": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.reshape(-1)), dim
            ),
            "sign": pa.array(np.full(t.num_rows, sign, np.int8)),
        },
        schema=_rows_schema(dim),
    )


def _cells_of(emb_rows: pa.Table, centroids: np.ndarray) -> np.ndarray:
    dim = centroids.shape[1]
    M = np.asarray(emb_rows["emb"].combine_chunks().flatten()).reshape(-1, dim)
    return np.argmax(M @ centroids.T, axis=1).astype(np.int32)


def _merge_cell(tables: list[pa.Table], dim: int) -> pa.Table:
    """base + delta patches → live rows (net sign > 0, one row per
    (doc, emb_hash))."""
    live = [t for t in tables if t is not None and t.num_rows]
    if not live:
        return _rows_schema(dim).empty_table()
    allr = pa.concat_tables(live)
    g = allr.group_by(["doc_id", "emb_hash"]).aggregate([("sign", "sum")])
    g = g.filter(pc.greater(g["sign_sum"], 0))
    if g.num_rows == 0:
        return _rows_schema(dim).empty_table()
    # join surviving keys back to ONE +1 row each (the embedding rides
    # on the + rows; duplicates collapse via unique-on-key)
    plus = allr.filter(pc.greater(allr["sign"], 0))
    sep = pa.scalar("\x1f")
    def key(t):
        return pc.binary_join_element_wise(
            t["doc_id"], pc.cast(t["emb_hash"], pa.string()), sep
        )
    alive = key(g).combine_chunks()
    plus = plus.filter(pc.is_in(key(plus), value_set=alive))
    k = key(plus).to_numpy(zero_copy_only=False)
    _, idx = np.unique(k, return_index=True)
    return plus.take(pa.array(np.sort(idx)))


def _write_cell(lake_dir, name, cell, version, rows: pa.Table, kind="part",
                from_version: int | None = None) -> str:
    """Cell base/delta writer. Refresh-written bytes depend on the
    refresh's FROM-version (which snapshot diff was computed), so the
    from-version is part of the file name — two refreshers racing the
    same lake version from different origins land on different paths and
    the exclusive idx_v{V}.json winner references only its own bytes.
    ``publish_part`` makes retried tasks no-ops and any residual
    same-path/different-bytes collision loud (see dedup_index)."""
    tag = f"{kind}-v{version:06d}" + (
        f"-from{from_version:06d}" if from_version is not None else ""
    )
    rel = os.path.join("_indexes", name, f"c={cell:04d}", f"{tag}.parquet")
    path = os.path.join(lake_dir, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp-{os.getpid()}"
    # deterministic byte layout: cell bytes must be a pure function of
    # (lake version, spec, from_version) for publish_part's
    # identical-bytes dedup to treat retried tasks as no-ops
    order = [("doc_id", "ascending"), ("emb_hash", "ascending"),
             ("sign", "ascending")] if "sign" in rows.schema.names else [
        ("doc_id", "ascending"), ("emb_hash", "ascending")]
    pq.write_table(rows.sort_by(order), tmp, compression="zstd")
    publish_part(tmp, path)
    return rel


def _read_cell(lake_dir: str, entry: dict | None, dim: int) -> pa.Table:
    if not entry:
        return _rows_schema(dim).empty_table()
    parts = []
    if entry.get("file"):
        parts.append(pq.read_table(os.path.join(lake_dir, entry["file"])))
    for rel in entry.get("deltas", []):
        parts.append(pq.read_table(os.path.join(lake_dir, rel)))
    return _merge_cell(parts, dim)


def _load_spec(lake_dir: str, name: str) -> dict:
    with open(os.path.join(_dir(lake_dir, name), "spec.json")) as f:
        return json.load(f)


def _load_manifest(lake_dir: str, name: str, version: int | None = None) -> dict:
    vs = index_versions(lake_dir, name)
    if not vs:
        raise FileNotFoundError(f"ann index {name!r}: not created")
    v = vs[-1] if version is None else version
    with open(os.path.join(_dir(lake_dir, name), f"idx_v{v:06d}.json")) as f:
        return json.load(f)


def load_centroids(lake_dir: str, name: str) -> np.ndarray:
    t = pq.read_table(os.path.join(_dir(lake_dir, name), "centroids.parquet"))
    dim = _load_spec(lake_dir, name)["dim"]
    return np.asarray(t["c"].combine_chunks().flatten()).reshape(-1, dim)


def create_ann_index(
    lake,
    name: str = "ann",
    dim: int = 16,
    n_cells: int = 16,
    seed: int = 7,
    sample: int = 256,
) -> dict:
    """Train the coarse quantizer on the creation version's
    lexicographically-first ``sample`` docs (a deterministic input
    constant thereafter), then build + publish the cell lists with one
    distributed scan."""
    from ..stages.similarity import kmeans_lite

    m = lake.manifest()
    if m is None:
        raise FileNotFoundError(f"{lake.lake_dir}: no committed manifest")
    spec = {"dim": dim, "n_cells": n_cells, "seed": seed, "sample": sample}
    d = _dir(lake.lake_dir, name)
    sp = os.path.join(d, "spec.json")
    if os.path.exists(sp):
        if _load_spec(lake.lake_dir, name) != spec:
            raise FileExistsError(f"ann index {name!r} exists with a different spec")
        return refresh_ann_index(lake, name)
    os.makedirs(d, exist_ok=True)

    # deterministic quantizer-training sample: first `sample` doc_ids
    # (ordered) of the creation snapshot, via the lake's own pruned read
    import ray

    ids_tbl = pa.concat_tables(
        ray.get(lake.read(columns=["doc_id", "tokens"]).to_arrow_refs())
    )
    order = pc.array_sort_indices(ids_tbl["doc_id"].combine_chunks())
    head = ids_tbl.take(order[: min(sample, ids_tbl.num_rows)])
    emb = token_embeddings(head["doc_id"], head["tokens"], dim, seed)
    centroids = kmeans_lite(emb, n_cells=n_cells, seed=seed)
    cpath = os.path.join(d, "centroids.parquet")
    tmp = cpath + f".tmp-{os.getpid()}"
    pq.write_table(
        pa.table({"c": pa.FixedSizeListArray.from_arrays(
            pa.array(centroids.reshape(-1)), dim)}),
        tmp,
    )
    try:
        os.link(tmp, cpath)
    except FileExistsError:
        pass
    finally:
        os.unlink(tmp)
    with open(sp + f".tmp-{os.getpid()}", "w") as f:
        json.dump(spec, f)
    try:
        os.link(sp + f".tmp-{os.getpid()}", sp)
    except FileExistsError:
        pass
    finally:
        os.unlink(sp + f".tmp-{os.getpid()}")

    cells_map = _build_cells(lake, name, spec, centroids, m.version)
    _publish(lake.lake_dir, name, m.version, cells_map)
    return _load_manifest(lake.lake_dir, name)


def _build_cells(lake, name, spec, centroids, version) -> dict:
    """Full-scan cell build (creation / dense-tick rebuild)."""
    lake_dir = lake.lake_dir
    dim = spec["dim"]
    cref = centroids

    def rows_with_cell(t: pa.Table) -> pa.Table:
        rows = _make_rows(t, spec, 1)
        if rows.num_rows == 0:
            return rows.append_column("cell", pa.array([], pa.int32()))
        return rows.append_column("cell", pa.array(_cells_of(rows, cref)))

    def write_group(g: pa.Table) -> pa.Table:
        c = int(g["cell"][0].as_py())
        rel = _write_cell(
            lake_dir, name, c, version, g.drop_columns(["cell"])
        )
        return pa.table({"cell": pa.array([c], pa.int32()),
                         "file": pa.array([rel])})

    from ..util.io import drop_schemaless_empties

    entries = drop_schemaless_empties(
        lake.read(columns=["doc_id", "tokens"])
        .map_batches(rows_with_cell, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(write_group, batch_format="pyarrow")
    ).take_all()
    return {str(int(e["cell"])): {"file": e["file"], "deltas": []} for e in entries}


def refresh_ann_index(
    lake, name: str = "ann", max_delta_rows: int = 2_000_000, max_deltas: int = 8
) -> dict:
    """Advance the index to the lake's latest version: manifest-diff →
    changed docs' −old/+new embedding rows → per-cell delta patches
    (compacted past ``max_deltas``); dense ticks fall back to a full
    rebuild, decided from footer metadata before any work."""
    import ray
    import ray.data as rd

    from .cdc import (
        _diff_snapshots,
        _merge_partition,
        _suffix_changed_images,
        _version_diff_plan,
    )

    m_new = lake.manifest()
    if m_new is None:
        raise FileNotFoundError(f"{lake.lake_dir}: no committed manifest")
    idx = _load_manifest(lake.lake_dir, name)
    if idx["version"] >= m_new.version:
        return idx
    spec = _load_spec(lake.lake_dir, name)
    dim = spec["dim"]
    centroids = load_centroids(lake.lake_dir, name)
    try:
        m_old = lake.manifest(idx["version"])
    except FileNotFoundError:
        m_old = None
    if m_old is None:
        cells_map = _build_cells(lake, name, spec, centroids, m_new.version)
        _publish(lake.lake_dir, name, m_new.version, cells_map)
        return _load_manifest(lake.lake_dir, name)

    items, same_p = _version_diff_plan(m_old, m_new)
    if not items:
        _publish(lake.lake_dir, name, m_new.version, dict(idx["buckets"]))
        return _load_manifest(lake.lake_dir, name)

    # dense-tick early rebuild from footer metadata only (the same
    # decision rule as the dedup index: patching most of the corpus
    # costs more than rebuilding it)
    if all(r.get("suffix_deltas") is not None for r in items):
        est = sum(
            pq.read_metadata(os.path.join(lake.lake_dir, d)).num_rows
            for r in items
            for d in r["suffix_deltas"]
        )
        if est * 2 > max_delta_rows:
            cells_map = _build_cells(lake, name, spec, centroids, m_new.version)
            _publish(lake.lake_dir, name, m_new.version, cells_map)
            return _load_manifest(lake.lake_dir, name)

    lake_dir = lake.lake_dir
    schema_b64 = m_new.schema.serialize().to_pybytes()
    p_new = m_new.num_partitions

    def delta_items(batch: pa.Table) -> pa.Table:
        from ..util.hashing import partition_of

        schema = pa.ipc.read_schema(pa.BufferReader(schema_b64))

        def snap(file, deltas):
            base = (
                pq.read_table(os.path.join(lake_dir, file))
                if file
                else schema.empty_table()
            )
            parts = [pq.read_table(os.path.join(lake_dir, dd)) for dd in deltas]
            return _merge_partition(base, parts, schema)

        outs = []
        for row in batch.to_pylist():
            k = int(row["k"])
            if row.get("suffix_deltas") is not None:
                old_sub, new_sub = _suffix_changed_images(lake_dir, row, schema)
            else:
                new_t = snap(row["new_file"], row["new_deltas"])
                olds = [snap(f, dd) for f, dd in zip(row["old_files"], row["old_deltas"])]
                old_t = (
                    pa.concat_tables(olds, promote_options="permissive")
                    if olds
                    else schema.empty_table()
                )
                if not same_p and old_t.num_rows:
                    old_t = old_t.filter(
                        pa.array(partition_of(old_t["doc_id"], p_new) == k)
                    )
                diff = _diff_snapshots(old_t, new_t)
                if diff.num_rows == 0:
                    continue
                ids = diff["doc_id"].combine_chunks()
                old_sub = old_t.filter(
                    pc.is_in(old_t["doc_id"].combine_chunks(), value_set=ids)
                )
                new_sub = new_t.filter(
                    pc.is_in(new_t["doc_id"].combine_chunks(), value_set=ids)
                )
            for sub, sign in ((new_sub, 1), (old_sub, -1)):
                r = _make_rows(sub.select(["doc_id", "tokens"]), spec, sign)
                outs.append(r)
        if not outs:
            return _rows_schema(dim).empty_table()
        allr = pa.concat_tables(outs)
        # residual cancellation: a no-op write's −/+ rows share
        # (doc, emb_hash) and net to zero
        g = allr.group_by(["doc_id", "emb_hash"]).aggregate([("sign", "sum")])
        g = g.filter(pc.not_equal(g["sign_sum"], 0))
        sep = pa.scalar("\x1f")
        def key(t):
            return pc.binary_join_element_wise(
                t["doc_id"], pc.cast(t["emb_hash"], pa.string()), sep
            )
        allr = allr.filter(pc.is_in(key(allr), value_set=key(g).combine_chunks()))
        return allr

    ds = rd.from_items(items, override_num_blocks=len(items)).map_batches(
        delta_items, batch_format="pyarrow"
    )
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    delta = pa.concat_tables(tables or [_rows_schema(dim).empty_table()])
    if delta.num_rows > max_delta_rows:
        cells_map = _build_cells(lake, name, spec, centroids, m_new.version)
        _publish(lake.lake_dir, name, m_new.version, cells_map)
        return _load_manifest(lake.lake_dir, name)

    cells = _cells_of(delta, centroids) if delta.num_rows else np.empty(0, np.int32)
    cells_map = {k: dict(v) for k, v in idx["buckets"].items()}
    new_version = m_new.version

    v_from = int(idx["version"])

    @ray.remote(num_cpus=1)
    def apply_cell(c: int, entry: dict | None, patch: pa.Table) -> tuple:
        entry = dict(entry) if entry else {"file": None, "deltas": []}
        rel = _write_cell(lake_dir, name, c, new_version, patch, kind="delta",
                          from_version=v_from)
        deltas = list(entry.get("deltas", [])) + [rel]
        if len(deltas) > max_deltas:
            parts = []
            if entry.get("file"):
                parts.append(pq.read_table(os.path.join(lake_dir, entry["file"])))
            parts += [pq.read_table(os.path.join(lake_dir, dd)) for dd in deltas]
            merged = _merge_cell(parts, dim)
            if merged.num_rows == 0:
                return c, None
            base = _write_cell(lake_dir, name, c, new_version, merged,
                               from_version=v_from)
            return c, {"file": base, "deltas": []}
        return c, {"file": entry.get("file"), "deltas": deltas}

    order = np.argsort(cells, kind="stable")
    ds_sorted = delta.take(pa.array(order))
    sc = cells[order]
    uniq, starts = np.unique(sc, return_index=True)
    bounds = np.append(starts, len(sc))
    refs = []
    for i, c in enumerate(uniq):
        patch = ds_sorted.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
        refs.append(apply_cell.remote(int(c), cells_map.get(str(int(c))), patch))
    for c, entry in ray.get(refs):
        if entry is None:
            cells_map.pop(str(c), None)
        else:
            cells_map[str(c)] = entry
    _publish(lake.lake_dir, name, new_version, cells_map)
    return _load_manifest(lake.lake_dir, name)


def ann_search(
    lake,
    name: str,
    query_doc_ids: list[str],
    k: int = 5,
    nprobe: int = 4,
    version: int | None = None,
) -> pa.Table:
    """Top-k cosine neighbors of the given docs' CURRENT images against
    the maintained index: embed the queries from point reads (never a
    scan), probe each query's ``nprobe`` closest cells, exact cosine
    within, global top-k with (−sim, doc_id) tie order. Returns
    (query_doc, doc_id, rank, sim)."""
    import ray

    spec = _load_spec(lake.lake_dir, name)
    dim = spec["dim"]
    centroids = load_centroids(lake.lake_dir, name)
    idx = _load_manifest(lake.lake_dir, name, version)
    qt = lake.lookup(query_doc_ids, columns=["doc_id", "tokens"])
    if qt.num_rows == 0:
        return pa.table(
            {"query_doc": pa.array([], pa.string()),
             "doc_id": pa.array([], pa.string()),
             "rank": pa.array([], pa.int64()),
             "sim": pa.array([], pa.float64())}
        )
    qids = qt["doc_id"].to_pylist()
    Q = token_embeddings(qt["doc_id"], qt["tokens"], dim, spec["seed"])
    probe_cells = np.argsort(-(Q @ centroids.T), axis=1)[:, :nprobe]
    need = sorted({int(c) for row in probe_cells for c in row})
    by_cell: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for c in probe_cells[qi]:
            by_cell.setdefault(int(c), []).append(qi)
    lake_dir = lake.lake_dir
    q_ref = ray.put(Q)

    @ray.remote(num_cpus=1)
    def score_cell(c: int, entry, q_idx: list[int], Qm) -> list[tuple]:
        """Score this cell's members against the queries probing it and
        return ONLY their per-cell top-k — O(k·queries) rows leave the
        task, never the cell itself (a cell is corpus/n_cells sized;
        shipping it to the driver would not scale)."""
        t = _read_cell(lake_dir, entry, dim)
        if t.num_rows == 0:
            return []
        M = np.asarray(t["emb"].combine_chunks().flatten()).reshape(-1, dim)
        ids = t["doc_id"].to_pylist()
        out = []
        for qi in q_idx:
            sims = M @ Qm[qi]
            top = sorted(zip(sims.tolist(), ids), key=lambda x: (-x[0], x[1]))[:k]
            out.append((qi, top))
        return out

    partials = ray.get(
        [
            score_cell.remote(c, idx["buckets"].get(str(c)), by_cell[c], q_ref)
            for c in need
        ]
    )
    merged: dict[int, list[tuple]] = {}
    for part in partials:
        for qi, top in part:
            merged.setdefault(qi, []).extend(top)
    out_q, out_d, out_r, out_s = [], [], [], []
    for qi, qd in enumerate(qids):
        scored = sorted(merged.get(qi, []), key=lambda t: (-t[0], t[1]))
        for rank, (s, d) in enumerate(scored[:k], start=1):
            out_q.append(qd), out_d.append(d), out_r.append(rank), out_s.append(s)
    return pa.table(
        {
            "query_doc": pa.array(out_q, pa.string()),
            "doc_id": pa.array(out_d, pa.string()),
            "rank": pa.array(out_r, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        }
    )
