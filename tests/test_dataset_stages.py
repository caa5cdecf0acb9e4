"""Dataset-level stage tests (need a Ray session): pre_aggregate,
lww_latest, exact_dedup, knn, lookup enrichment."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data

    return ray.data


def test_pre_aggregate_all_kinds(rd):
    t = pa.table(
        {
            "k": ["a", "a", "b", "b", "b"],
            "v": [1.0, 3.0, 10.0, 20.0, 30.0],
        }
    )
    from nifi_ray.stages.aggregate import pre_aggregate

    ds = rd.from_arrow(t)
    out = (
        pre_aggregate(
            ds,
            "k",
            {
                "n": ("k", "count"),
                "s": ("v", "sum"),
                "mn": ("v", "min"),
                "mx": ("v", "max"),
                "avg": ("v", "mean"),
            },
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["n"].tolist() == [2, 3]
    assert out["s"].tolist() == [4.0, 60.0]
    assert out["mn"].tolist() == [1.0, 10.0]
    assert out["mx"].tolist() == [3.0, 30.0]
    assert out["avg"].tolist() == [2.0, 20.0]


def test_lww_latest(rd):
    t = pa.table(
        {
            "k": ["a", "b", "a", "a", "b"],
            "o": [1, 2, 5, 3, 1],
            "v": ["x1", "y2", "x5", "x3", "y1"],
        }
    )
    from nifi_ray.stages.lww import lww_latest

    out = lww_latest(rd.from_arrow(t), "k", "o").to_pandas().sort_values("k")
    assert out["v"].tolist() == ["x5", "y2"]


def test_exact_dedup(rd):
    t = pa.table({"id": [3, 1, 2, 4], "text": ["dup", "dup", "uniq", "dup"]})
    from nifi_ray.stages.dedup import exact_dedup

    out = exact_dedup(rd.from_arrow(t), "text", order="id").to_pandas()
    assert sorted(out["id"].tolist()) == [1, 2]  # first writer (min id) wins


def test_knn_brute_force(rd):
    rng = np.random.default_rng(0)
    X = rng.standard_normal((50, 8))
    t = pa.table(
        {
            "vec_id": pa.array(range(50), pa.int64()),
            "embedding": pa.array(list(X), pa.list_(pa.float64())),
        }
    )
    from nifi_ray.stages.similarity import knn_brute_force

    queries = {"query_id": [0, 7], "matrix": X[[0, 7]]}
    out = knn_brute_force(rd.from_arrow(t), queries, k=3).to_pandas()
    # each query's rank-1 neighbour is itself (cosine 1.0)
    top = out[out["rank"] == 1].set_index("query_id")["vec_id"]
    assert top[0] == 0 and top[7] == 7
    # exact vs numpy oracle for query 0
    sims = (X / np.linalg.norm(X, axis=1, keepdims=True)) @ (X[0] / np.linalg.norm(X[0]))
    want = np.argsort(-sims)[:3]
    got = out[out["query_id"] == 0].sort_values("rank")["vec_id"].tolist()
    assert got == want.tolist()


def test_broadcast_enrich_missing_key_is_null(rd, ray_session):
    import ray

    from nifi_ray.stages.lookup import BroadcastEnrich

    dim = pa.table({"k": [1, 2], "name": ["one", "two"]})
    e = BroadcastEnrich(ray.put(dim), "fk", "k")
    out = e(pa.table({"fk": [2, 99, 1]}))
    assert out["name"].to_pylist() == ["two", None, "one"]


def test_exact_dedup_projected(rd):
    """project=True: slim shuffle + join restores winner payloads —
    same output as the unprojected path."""
    from nifi_ray.stages.dedup import exact_dedup

    t = pa.table(
        {
            "id": ["d", "c", "b", "a"],
            "text": ["x", "x", "y", "y"],
        }
    )
    plain = (
        exact_dedup(rd.from_arrow(t), "text", order="id")
        .to_pandas()[["id", "content_hash"]]
        .sort_values("id")
        .reset_index(drop=True)
    )
    proj = (
        exact_dedup(rd.from_arrow(t), "text", order="id", project=True)
        .to_pandas()[["id", "content_hash"]]
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert plain.equals(proj)
    assert sorted(proj["id"]) == ["a", "c"]


def test_lsh_bucket_cap_degenerate(rd):
    """A degenerate bucket (every doc identical) is capped: pair count
    is C(cap, 2), not C(n, 2), and the pipeline completes."""
    from nifi_ray.stages.dedup import MinHasher, distinct_pairs, lsh_candidate_pairs

    n = 40
    t = pa.table(
        {
            "doc_id": [f"d{i:03d}" for i in range(n)],
            "text": ["the same words again and again"] * n,
        }
    )

    class MH(MinHasher):
        def __init__(self):
            super().__init__(num_hashes=8, bands=2)

    bands = rd.from_arrow(t).map_batches(MH, batch_format="pyarrow", concurrency=1)
    pairs = distinct_pairs(lsh_candidate_pairs(bands, max_bucket=10)).to_pandas()
    assert len(pairs) == 10 * 9 // 2  # capped, deduped across the 2 bands


def test_connected_components_ds_matches_driver(rd):
    """Distributed min-label propagation == driver pandas variant."""
    from nifi_ray.stages.components import connected_components, connected_components_ds

    edges = pa.table(
        {
            "a": ["a", "b", "x", "p"],
            "b": ["b", "c", "y", "q"],
        }
    )
    ds_pairs = rd.from_arrow(edges)
    want = connected_components(ds_pairs)
    got = (
        connected_components_ds(rd.from_arrow(edges))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert got["node"].tolist() == want["node"].tolist()
    assert got["component"].tolist() == want["component"].tolist()
    # chain a-b-c collapses to min label 'a'
    assert got.set_index("node")["component"]["c"] == "a"
