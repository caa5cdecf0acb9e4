"""Deterministic KLL-lite quantile sketch: rank-error bound vs exact
quantiles, serialization roundtrip, canonical-fold determinism under
different partitionings, and the graded query vs its sequential oracle
on the sf0.001 fixture."""

import numpy as np
import pyarrow as pa
import pytest


def _exact_rank(sorted_vals: np.ndarray, v: float) -> int:
    return int(np.searchsorted(sorted_vals, v, side="right"))


@pytest.mark.parametrize("seed,n", [(1, 5000), (7, 60000)])
def test_kll_rank_error_bound(seed, n):
    from nifi_ray.stages.sketch import KLL_K, KLLSketch

    rng = np.random.default_rng(seed)
    vals = rng.normal(size=n) * 100.0
    sk = KLLSketch()
    # feed in several chunks (exercises repeated compaction)
    for chunk in np.array_split(vals, 7):
        sk.add_many(chunk)
    assert sk.n == n
    s = np.sort(vals)
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    est = sk.quantiles(qs)
    # deterministic Munro-Paterson-style bound: ±(n/k)·log2(#levels)
    levels = max(2, len(sk.levels))
    tol = (n / KLL_K) * np.log2(levels) + 1
    for q, e in zip(qs, est):
        r = _exact_rank(s, e)
        assert abs(r - q * n) <= tol, (q, r, q * n, tol)


def test_kll_fold_preserves_rank_bound():
    """The sharded-and-folded sketch (the graded plan's shape) must
    keep the same deterministic rank-error bound as a single sketch:
    merging cannot silently degrade accuracy beyond the level-count
    growth the bound already prices in."""
    from nifi_ray.stages.sketch import KLL_K, KLLSketch

    rng = np.random.default_rng(23)
    n = 80000
    vals = rng.exponential(size=n) * 50.0  # skewed, not normal
    acc = KLLSketch()
    for shard in np.array_split(vals, 20):  # 20 shard sketches, folded
        sk = KLLSketch()
        sk.add_many(np.sort(shard))
        acc.merge(sk)
    assert acc.n == n
    s = np.sort(vals)
    levels = max(2, len(acc.levels))
    tol = (n / KLL_K) * np.log2(levels) + 1
    for q in (0.05, 0.25, 0.5, 0.75, 0.95, 0.99):
        e = acc.quantiles([q])[0]
        r = _exact_rank(s, e)
        assert abs(r - q * n) <= tol, (q, r, q * n, tol)


def test_kll_serialization_roundtrip():
    from nifi_ray.stages.sketch import KLLSketch

    rng = np.random.default_rng(3)
    sk = KLLSketch()
    sk.add_many(rng.uniform(size=3000))
    back = KLLSketch.from_row(sk.to_row())
    assert back.n == sk.n and back.parity == sk.parity
    assert all(np.array_equal(a, b) for a, b in zip(back.levels, sk.levels))
    assert np.array_equal(back.quantiles([0.5]), sk.quantiles([0.5]))


def test_kll_shard_fold_partition_invariant(ray_session):
    """The graded plan's whole point: content-defined shards + canonical
    fold make the result independent of Ray block boundaries."""
    import ray.data

    from nifi_ray.stages.sketch import kll_fold, kll_shard_fn
    from nifi_ray.util.io import drop_schemaless_empties

    rng = np.random.default_rng(11)
    n = 20000
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "value": pa.array(rng.normal(size=n), pa.float64()),
        }
    )

    def run(n_parts: int):
        ds = ray.data.from_arrow(tbl).repartition(n_parts)
        sharded = ds.map_batches(
            lambda t: t.append_column(
                "shard",
                pa.array(
                    t["event_id"].to_numpy(zero_copy_only=False) // 4096, pa.int64()
                ),
            ),
            batch_format="pyarrow",
        )
        parts = drop_schemaless_empties(
            sharded.groupby("shard").map_groups(
                kll_shard_fn("value", "event_id"), batch_format="pyarrow"
            )
        ).take_all()
        return kll_fold(parts).quantiles([0.05, 0.5, 0.95])

    a, b = run(2), run(9)
    assert np.array_equal(a, b)


def test_kll_query_matches_sequential_oracle(ray_session):
    from nifi_ray.oracle_expected import expected_kll_quantiles
    from nifi_ray.pipelines.queries import q_kll_quantiles

    sf = "/root/testdata/sf0.001"
    got = q_kll_quantiles(sf).to_pylist()
    want = expected_kll_quantiles(sf).to_pylist()
    assert got == want and len(got) == 9
