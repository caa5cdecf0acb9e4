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
    of (query_id, id, sim, rank), exact."""
    ref = ray.put(queries)
    cands = ds.map_batches(
        LocalTopK,
        fn_constructor_args=(ref,),
        fn_constructor_kwargs={"id_col": id_col, "col": col, "k": k},
        batch_format="pyarrow",
        concurrency=2,
    )
    return global_topk(cands, k, id_col)
