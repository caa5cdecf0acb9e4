"""As-of and range lookup joins vs independent oracles (pandas
merge_asof / DuckDB ASOF JOIN), including null/edge cases."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from nifi_ray.stages.joins import AsofLookup, RangeLookup


def _asof_case(seed, n_fact=2000, n_keys=7, n_dim_per_key=15):
    rng = np.random.default_rng(seed)
    dim = pa.table(
        {
            "k": pa.array(np.repeat(np.arange(n_keys), n_dim_per_key), pa.int64()),
            "ts": pa.array(
                np.concatenate(
                    [np.sort(rng.choice(10_000, n_dim_per_key, replace=False)) for _ in range(n_keys)]
                ).astype(np.int64)
            ),
            "rate": pa.array(rng.integers(1, 100, n_keys * n_dim_per_key).astype(np.int64)),
        }
    )
    fact = pa.table(
        {
            "k": pa.array(rng.integers(0, n_keys + 2, n_fact).astype(np.int64)),  # +2 unknown keys
            "ts": pa.array(rng.integers(-50, 10_500, n_fact).astype(np.int64)),
        }
    )
    return fact, dim


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_matches_pandas_merge_asof(ray_session, seed):
    fact, dim = _asof_case(seed)
    stage = AsofLookup(dim, "k", "ts")
    got = stage(fact).to_pandas()

    fd = fact.to_pandas().reset_index().sort_values("ts")
    dd_ = dim.to_pandas().sort_values("ts")
    exp = pd.merge_asof(fd, dd_, on="ts", by="k", direction="backward")
    exp = exp.sort_values("index").reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["rate"], exp["rate"], check_names=False, check_dtype=False
    )


def test_asof_matches_duckdb(ray_session):
    fact, dim = _asof_case(99)
    got = AsofLookup(dim, "k", "ts")(fact).to_pandas()
    con = duckdb.connect()
    con.register("fact", fact.to_pandas().reset_index())
    con.register("dim", dim.to_pandas())
    exp = con.execute(
        """SELECT f.index, d.rate FROM fact f
           ASOF LEFT JOIN dim d ON f.k = d.k AND f.ts >= d.ts
           ORDER BY f.index"""
    ).df()
    assert (
        got["rate"].fillna(-1).astype(int).tolist()
        == exp["rate"].fillna(-1).astype(int).tolist()
    )


def test_asof_timestamp_type_and_broadcast_ref(ray_session):
    dim = pa.table(
        {
            "k": pa.array([1, 1], pa.int64()),
            "ts": pa.array([1_000_000, 5_000_000], pa.timestamp("us")),
            "v": ["a", "b"],
        }
    )
    fact = pa.table(
        {
            "k": pa.array([1, 1, 1], pa.int64()),
            "ts": pa.array([999_999, 1_000_000, 9_000_000], pa.timestamp("us")),
        }
    )
    ref = ray.put(dim)
    out = AsofLookup(ref, "k", "ts")(fact)
    assert out["v"].to_pylist() == [None, "a", "b"]


def test_asof_in_dataset_pipeline(ray_session, tmp_path):
    import ray.data

    fact, dim = _asof_case(7, n_fact=5000)
    ds = ray.data.from_arrow(fact).map_batches(
        AsofLookup,
        fn_constructor_args=(ray.put(dim), "k", "ts"),
        batch_format="pyarrow",
        concurrency=2,
        batch_size=512,
    )
    got = ds.to_pandas()
    fd = fact.to_pandas().sort_values("ts")
    exp = pd.merge_asof(fd, dim.to_pandas().sort_values("ts"), on="ts", by="k")
    assert got["rate"].sum() == pytest.approx(exp["rate"].sum())
    assert got["rate"].isna().sum() == exp["rate"].isna().sum()


def test_range_lookup(ray_session):
    ranges = pa.table(
        {
            "lo": pa.array([0, 100, 500], pa.int64()),
            "hi": pa.array([100, 300, 1000], pa.int64()),
            "name": ["low", "mid", "high"],
        }
    )
    batch = pa.table({"v": pa.array([-5, 0, 99, 100, 299, 300, 500, 999, 1000], pa.int64())})
    out = RangeLookup(ranges, "v")(batch)
    assert out["name"].to_pylist() == [
        None, "low", "low", "mid", "mid", None, "high", "high", None,
    ]


def test_range_lookup_contiguous_defaults(ray_session):
    # no hi column → [lo_i, lo_{i+1}) with the last open-ended
    ranges = pa.table({"lo": pa.array([0, 10, 20], pa.int64()), "g": ["a", "b", "c"]})
    batch = pa.table({"v": pa.array([-1, 0, 9, 10, 19, 20, 10_000], pa.int64())})
    out = RangeLookup(ranges, "v")(batch)
    assert out["g"].to_pylist() == [None, "a", "a", "b", "b", "c", "c"]


# ------------------------------------------------------- bloom semi-join


def test_bloom_semijoin_no_false_negatives(ray_session):
    import ray

    from nifi_ray.stages.joins import bloom_semijoin_filter

    build = ray.data.from_arrow(
        pa.table({"k": pa.array([2, 4, 6, 8, 1000], pa.int64())})
    )
    probe = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(list(range(20)) + [1000, None], pa.int64()),
                "v": pa.array([f"r{i}" for i in range(22)]),
            }
        )
    )
    kept = bloom_semijoin_filter(
        probe, build, "k", "k", n_items_hint=16, fp_rate=0.01
    ).take_all()
    kept_keys = {r["k"] for r in kept}
    # every true match survives (no false negatives), null key dropped
    assert {2, 4, 6, 8, 1000} <= kept_keys
    assert None not in kept_keys
    # the filter is selective: most non-matching keys are gone
    assert len(kept_keys) < 20


def test_bloom_semijoin_string_keys(ray_session):
    import ray

    from nifi_ray.stages.joins import bloom_semijoin_filter

    build = ray.data.from_arrow(pa.table({"name": ["alice", "carol"]}))
    probe = ray.data.from_arrow(
        pa.table({"name": ["alice", "bob", "carol", "dan", None]})
    )
    kept = bloom_semijoin_filter(
        probe, build, "name", "name", n_items_hint=8, fp_rate=0.001
    ).take_all()
    names = sorted(r["name"] for r in kept)
    assert "alice" in names and "carol" in names and None not in names


def test_footer_stats_matches_full_scan(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from nifi_ray.sources.footer import footer_stats

    t = pa.table(
        {
            "a": pa.array([5.5, -2.0, 7.25, 0.0], pa.float64()),
            "b": pa.array([10, 3, 99, -4], pa.int64()),
            "s": pa.array(["x", "y", "z", "w"]),
        }
    )
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p, row_group_size=2)  # multiple row groups
    out = footer_stats([p], ["a", "b"]).take_all()[0]
    assert out["n_rows"] == 4
    assert out["min_a"] == -2.0 and out["max_a"] == 7.25
    assert out["min_b"] == -4 and out["max_b"] == 99
    # string stats are refused loudly (writer truncation hazard)
    import pytest as _pytest

    with _pytest.raises(TypeError):
        footer_stats([p], ["s"])
