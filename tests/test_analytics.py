"""Analytics-operator tests: running totals, pivot indicators, global
moments / z-score gating, ROLLUP re-aggregation, exact histogram
quantiles (including the refinement path and float-boundary edges)."""

import math

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data

    return ray.data


def test_running_total_orders_and_accumulates(rd):
    from nifi_ray.stages.windows import running_total_fn

    g = pa.table(
        {
            "k": ["u"] * 4,
            "ts": [3, 1, 2, 1],
            "id": [40, 10, 30, 5],
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    out = running_total_fn("k", ["ts", "id"], "v", "running")(g)
    # order: (1,5)=4.0 → (1,10)=2.0 → (2,30)=3.0 → (3,40)=1.0
    assert out["id"].to_pylist() == [5, 10, 30, 40]
    assert out["running"].to_pylist() == [4.0, 6.0, 9.0, 10.0]


def test_pivot_indicators_counts_and_gated_sums():
    from nifi_ray.stages.aggregate import pivot_indicators

    t = pa.table(
        {
            "et": ["a", "b", None, "a"],
            "v": [1.0, 2.0, 3.0, None],
        }
    )
    out = pivot_indicators("et", ["a", "b"], value_col="v")(t)
    assert out["n_a"].to_pylist() == [1, 0, 0, 1]
    assert out["n_b"].to_pylist() == [0, 1, 0, 0]
    # null value gated to 0, non-matching rows contribute 0
    assert out["sum_a"].to_pylist() == [1.0, 0.0, 0.0, 0.0]
    assert out["sum_b"].to_pylist() == [0.0, 2.0, 0.0, 0.0]


def test_global_moments_matches_numpy(rd):
    from nifi_ray.stages.aggregate import global_moments

    rng = np.random.default_rng(7)
    v = rng.normal(50, 10, size=5000)
    ds = rd.from_arrow(pa.table({"x": v})).repartition(8)
    n, mean, std = global_moments(ds, "x")
    assert n == 5000
    assert abs(mean - v.mean()) < 1e-9
    assert abs(std - v.std()) < 1e-9


def test_global_moments_empty(rd):
    from nifi_ray.stages.aggregate import global_moments

    ds = rd.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
    assert global_moments(ds, "x") == (0, 0.0, 0.0)


def test_rollup2_levels(rd):
    from nifi_ray.stages.aggregate import rollup2

    t = pa.table(
        {
            "a": ["x", "x", "y", "y"],
            "b": ["p", "q", "p", "p"],
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    out = rollup2(ds, "a", "b", {"n": ("v", "count"), "s": ("v", "sum")})
    rows = {
        (r["a"], r["b"]): (r["n"], r["s"]) for r in out.to_pylist()
    }
    assert rows[("x", "p")] == (1, 1.0)
    assert rows[("x", "q")] == (1, 2.0)
    assert rows[("y", "p")] == (2, 7.0)
    assert rows[("x", None)] == (2, 3.0)
    assert rows[("y", None)] == (2, 7.0)
    assert rows[(None, None)] == (4, 10.0)
    assert len(rows) == 6


def _disc(v: np.ndarray, q: float) -> float:
    # DuckDB quantile_disc: 1-based ascending rank max(1, ceil(q*n))
    s = np.sort(v)
    return float(s[max(1, math.ceil(q * len(v))) - 1])


def test_exact_quantiles_matches_disc_rule(rd):
    from nifi_ray.stages.aggregate import exact_quantiles

    rng = np.random.default_rng(3)
    v = np.round(rng.uniform(0, 1000, size=4321), 2)
    ds = rd.from_arrow(pa.table({"x": v})).repartition(7)
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    out = exact_quantiles(ds, "x", qs)
    got = dict(zip(out["q"].to_pylist(), out["value"].to_pylist()))
    for q in qs:
        assert got[q] == _disc(v, q), q


def test_exact_quantiles_refinement_path(rd):
    """collect_threshold smaller than any bucket forces the recursive
    re-histogram; results must stay exact."""
    from nifi_ray.stages.aggregate import exact_quantiles

    rng = np.random.default_rng(9)
    v = rng.normal(0, 1, size=3000)
    ds = rd.from_arrow(pa.table({"x": v})).repartition(5)
    qs = [0.5, 0.9]
    out = exact_quantiles(ds, "x", qs, n_buckets=4, collect_threshold=50)
    got = dict(zip(out["q"].to_pylist(), out["value"].to_pylist()))
    for q in qs:
        assert got[q] == _disc(v, q), q


def test_exact_quantiles_constant_column(rd):
    """All-equal values: zero-width range cannot split — the collect
    fallback must still return the value."""
    from nifi_ray.stages.aggregate import exact_quantiles

    v = np.full(500, 42.5)
    ds = rd.from_arrow(pa.table({"x": v}))
    out = exact_quantiles(ds, "x", [0.5], collect_threshold=10)
    assert out["value"].to_pylist() == [42.5]


def test_exact_quantiles_extremes_and_duplicates(rd):
    from nifi_ray.stages.aggregate import exact_quantiles

    v = np.array([1.0, 1.0, 1.0, 2.0, 2.0, 3.0, 100.0])
    ds = rd.from_arrow(pa.table({"x": v}))
    out = exact_quantiles(ds, "x", [0.01, 0.5, 1.0], n_buckets=8)
    got = dict(zip(out["q"].to_pylist(), out["value"].to_pylist()))
    assert got[0.01] == 1.0
    assert got[0.5] == 2.0
    assert got[1.0] == 100.0


def test_semdedup_greedy_keeps_one_per_clump():
    from nifi_ray.stages.similarity import semdedup_group_fn

    # cell with two exact-dup pairs and one loner
    base = np.random.default_rng(1).normal(size=(3, 8))
    X = np.vstack([base[0], base[0] * 2.0, base[1], base[1] * 0.5, base[2]])
    g = pa.table(
        {
            "vec_id": pa.array([10, 11, 20, 21, 30], pa.int64()),
            "embedding": pa.array(X.tolist(), pa.list_(pa.float32())),
            "cell": pa.array([0] * 5, pa.int32()),
        }
    )
    out = semdedup_group_fn(0.95)(g)
    kept = dict(zip(out["vec_id"].to_pylist(), out["kept"].to_pylist()))
    # scaled copies are cosine-1 to their base: lowest id survives
    assert kept == {10: True, 11: False, 20: True, 21: False, 30: True}


def test_semdedup_cascade_kept_set_only():
    """B dups A (dropped), C dups B but NOT A → C must be KEPT: the
    greedy compares against the kept set, not all earlier items."""
    from nifi_ray.stages.similarity import semdedup_group_fn

    a = np.array([1.0, 0.0])
    b = np.array([0.9, np.sqrt(1 - 0.81)])  # cos(a,b) = 0.9
    # c: cos(b,c)=0.9 but cos(a,c)=0.62 — rotate b by the same angle
    th = np.arccos(0.9)
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    c = rot @ b
    g = pa.table(
        {
            "vec_id": pa.array([1, 2, 3], pa.int64()),
            "embedding": pa.array([a.tolist(), b.tolist(), c.tolist()],
                                  pa.list_(pa.float32())),
            "cell": pa.array([0, 0, 0], pa.int32()),
        }
    )
    out = semdedup_group_fn(0.85)(g)
    assert out["kept"].to_pylist() == [True, False, True]


def test_hopping_window_stamp_covering_windows():
    from nifi_ray.stages.windows import stamp_hopping_windows

    # event at t=47s with size=60 hop=15 → windows starting 45,30,15,0
    t = pa.table({"ts": pa.array([47_000_000], pa.timestamp("us")), "v": [1.0]})
    out = stamp_hopping_windows("ts", 60, 15)(t)
    starts = sorted(
        s // 1_000_000
        for s in out["window_start"].cast(pa.int64()).to_pylist()
    )
    assert starts == [0, 15, 30, 45]
    # every stamped window actually covers the event
    for w in starts:
        assert w <= 47 < w + 60
    with pytest.raises(ValueError):
        stamp_hopping_windows("ts", 60, 7)


def test_dense_rank_ties_share_rank_no_gaps():
    from nifi_ray.stages.windows import dense_rank_fn

    g = pa.table({"k": ["a"] * 5, "id": [1, 2, 3, 4, 5],
                  "v": [9.0, 7.0, 9.0, 3.0, 7.0]})
    out = dense_rank_fn("k", "v", out="rank")(g)
    got = dict(zip(out["id"].to_pylist(), out["rank"].to_pylist()))
    assert got == {1: 1, 3: 1, 2: 2, 5: 2, 4: 3}


def test_group_quantiles_matches_duckdb_disc_rule():
    import duckdb

    from nifi_ray.stages.windows import group_quantiles_fn

    rng = np.random.default_rng(3)
    v = np.round(rng.normal(100, 25, size=137), 2)
    g = pa.table({"k": ["x"] * len(v), "v": v})
    out = group_quantiles_fn("k", "v", {"p25": 0.25, "p50": 0.5, "p99": 0.99})(g)
    exp = duckdb.sql(
        "SELECT quantile_disc(v, 0.25), quantile_disc(v, 0.5), "
        "quantile_disc(v, 0.99) FROM g"
    ).fetchone()
    assert (
        out["p25"][0].as_py(),
        out["p50"][0].as_py(),
        out["p99"][0].as_py(),
    ) == exp


def test_funnel_requires_strict_order():
    from nifi_ray.stages.windows import funnel_stage_fn

    fn = funnel_stage_fn("u", "ts", "et", ["view", "click", "purchase"])
    # purchase BEFORE the first post-view click → depth stops at 2
    g = pa.table({"u": [1] * 4, "ts": [10, 20, 15, 5],
                  "et": ["view", "click", "purchase", "purchase"]})
    assert fn(g)["stage"].to_pylist() == [2]
    # full ordered funnel
    g2 = pa.table({"u": [2] * 3, "ts": [1, 2, 3],
                   "et": ["view", "click", "purchase"]})
    assert fn(g2)["stage"].to_pylist() == [3]
    # no view at all → 0
    g3 = pa.table({"u": [3] * 2, "ts": [1, 2], "et": ["click", "purchase"]})
    assert fn(g3)["stage"].to_pylist() == [0]


def test_term_postings_distinct_pairs():
    from nifi_ray.stages.quality import term_postings

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": ["The cat cat, dog!", "Dog dog 42"],
        }
    )
    out = term_postings()(t)
    pairs = set(zip(out["term"].to_pylist(), out["doc_id"].to_pylist()))
    assert pairs == {("the", 1), ("cat", 1), ("dog", 1), ("dog", 2)}


def test_term_pair_partials_distinct_unordered():
    from nifi_ray.stages.quality import term_pair_partials

    t = pa.table({"text": ["cat dog cat bird", "dog cat", None, "solo"]})
    out = term_pair_partials(col="text")(t)
    got = {
        (a, b): n
        for a, b, n in zip(
            out["t1"].to_pylist(), out["t2"].to_pylist(), out["n_both"].to_pylist()
        )
    }
    # per-doc distinct pairs, t1 < t2; repeats inside a doc count once
    assert got == {
        ("bird", "cat"): 1,
        ("bird", "dog"): 1,
        ("cat", "dog"): 2,
    }


# ------------------------------------------------------ full-corpus k-means


def test_kmeans_cell_stats_order_invariant():
    from nifi_ray.stages.similarity import kmeans_cell_stats_fn

    rng = np.random.default_rng(5)
    V = rng.normal(size=(7, 4))
    C = np.eye(4)[:2]
    g = pa.table(
        {
            "vec_id": pa.array([3, 0, 5, 1, 6, 2, 4], pa.int64()),
            "embedding": pa.array(
                [V[i].tolist() for i in [3, 0, 5, 1, 6, 2, 4]],
                pa.list_(pa.float64()),
            ),
            "cell": pa.array([1] * 7, pa.int32()),
        }
    )
    fn = kmeans_cell_stats_fn(C)
    out = fn(g)
    # reference: vec_id-ordered unit rows summed by numpy
    X = V / np.linalg.norm(V, axis=1, keepdims=True)
    assert out["n"].to_pylist() == [7]
    assert out["vec_sum"][0].as_py() == X.sum(axis=0).tolist()
    assert out["sim_sum"][0].as_py() == float(np.sum(X @ C[1]))
    # bitwise invariance to input row order (the canonical-sort property)
    out2 = fn(g.take(pa.array([6, 5, 4, 3, 2, 1, 0])))
    assert out2["vec_sum"][0].as_py() == out["vec_sum"][0].as_py()
    assert out2["sim_sum"][0].as_py() == out["sim_sum"][0].as_py()
    # empty hash partition stays typed
    assert fn(g.slice(0, 0)).schema.names == ["cell", "n", "vec_sum", "sim_sum"]


def test_kmeans_full_separates_two_blobs(rd):
    from nifi_ray.stages.similarity import kmeans_full

    rng = np.random.default_rng(11)
    a = rng.normal(loc=(5, 0, 0), scale=0.05, size=(20, 3))
    b = rng.normal(loc=(0, 5, 0), scale=0.05, size=(20, 3))
    X = np.vstack([a, b])
    t = pa.table(
        {
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array(X.tolist(), pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(t)
    init = X[:2] / np.linalg.norm(X[:2], axis=1, keepdims=True)
    C, stats = kmeans_full(ds, init, iters=3, concurrency=2)
    by_cell = {r["cell"]: r for r in stats}
    # both init vectors sit in blob a; Lloyd must still split the blobs
    assert sorted(r["n"] for r in stats) == [20, 20]
    # centroids point at the blob means (unit-normalized)
    dirs = sorted(tuple(np.round(C[c], 1)) for c in by_cell)
    assert dirs == [(0.0, 1.0, 0.0), (1.0, 0.0, 0.0)]
    # tight clusters: mean cosine to own centroid ≈ 1
    for r in stats:
        assert r["sim_sum"] / r["n"] > 0.999


# ------------------------------------------------------------- bigram LM


def test_bigram_frequency_within_doc_only():
    from nifi_ray.stages.quality import bigram_frequency

    t = pa.table({"text": ["a b c", "c a"]})
    out = bigram_frequency()(t)
    pairs = {
        (w1, w2): tf
        for w1, w2, tf in zip(
            out["w1"].to_pylist(), out["w2"].to_pylist(), out["tf"].to_pylist()
        )
    }
    # no ("c","c") bridge across the doc boundary
    assert pairs == {("a", "b"): 1, ("b", "c"): 1, ("c", "a"): 1}


def test_bigram_lm_matches_reference(rd):
    import ray

    from nifi_ray.stages.quality import BigramLM

    docs = ["the cat sat", "the cat ran", "x"]
    counts = {
        ("the", "cat"): 2,
        ("cat", "sat"): 1,
        ("cat", "ran"): 1,
    }
    ref = ray.put(counts)
    lm = BigramLM(ref)
    out = lm(pa.table({"doc_id": [0, 1, 2], "text": docs}))
    assert out["n_bigram"].to_pylist() == [2, 2, 0]
    # doc 0: -[ln(2/2) + ln(1/2)]/2 = ln2/2
    assert math.isclose(out["avg_nll"][0].as_py(), math.log(2) / 2, rel_tol=1e-12)
    assert out["avg_nll"][2].as_py() == 0.0


def test_watermark_late_flags_matches_sequential(rd):
    import hashlib

    import ray

    from nifi_ray.stages.windows import watermark_late_flags

    # shuffled event times: sequential watermark reference
    rng = np.random.default_rng(5)
    n = 400
    ts = rng.integers(0, 10**9, n) * 1_000_000  # µs
    ids = np.arange(n)
    tbl = pa.table(
        {"event_id": ids, "ts": pa.array(ts, pa.timestamp("us"))}
    )
    ds = ray.data.from_arrow(tbl).repartition(7)
    out = watermark_late_flags(
        ds, "ts", "event_id", lateness_sec=3600
    ).take_all()
    got = {r["event_id"]: r["late"] for r in out}
    # sequential reference over the same md5 arrival order
    order = sorted(range(n), key=lambda i: hashlib.md5(f"{i}#wm".encode()).hexdigest())
    wm = None
    late_us = 3600 * 1_000_000
    for i in order:
        expect = wm is not None and int(ts[i]) < wm - late_us
        assert got[ids[i]] == expect, f"event {i}"
        wm = int(ts[i]) if wm is None else max(wm, int(ts[i]))
