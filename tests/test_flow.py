"""Flow builder (pipelines/flow.py): DAG compile, diamond fan-out,
funnel union, config-driven construction, cycle detection."""

import pyarrow as pa
import pytest

from nifi_ray.pipelines.flow import Flow


def _src():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "k": ["a", "b", "a", "c", "b", "a"],
        "v": [1, 2, 3, 4, 5, 6],
    }))


def _make_double():
    # closure (cloudpickle-by-value): module-level test functions pickle
    # by reference and Ray workers cannot import the test module
    import pyarrow.compute as pc

    return lambda t: t.set_column(1, "v", pc.multiply(t["v"], 2))


_double = _make_double()


def test_diamond_funnel_and_sink(ray_session):
    flow = (
        Flow()
        .source("in", _src)
        .stage("doubled", "in", _double)
        .filter("as_", "doubled", "k == 'a'")
        .filter("bs", "doubled", "k == 'b'")
        .union("funnel", ["as_", "bs"])
        .sink("out", "funnel", lambda ds: sorted(r["v"] for r in ds.take_all()))
    )
    assert flow.run() == {"out": [2, 4, 6, 10, 12]}
    # memoized compile: both filters share ONE upstream node object
    assert flow.dataset("as_") is flow.dataset("as_")


def test_run_without_sinks_returns_terminals(ray_session):
    flow = Flow().source("in", _src).filter("a", "in", "k == 'a'")
    out = flow.run()
    assert set(out) == {"a"} and out["a"].count() == 3


def test_from_config_with_registry(ray_session):
    spec = [
        {"name": "in", "kind": "source", "ds": "src"},
        {"name": "doubled", "kind": "stage", "upstream": "in", "fn": "double"},
        {"name": "big", "kind": "filter", "upstream": "doubled", "predicate": "@big_rows"},
        {"name": "out", "kind": "sink", "upstream": "big", "consume": "count"},
    ]
    registry = {
        "src": _src,
        "double": _double,
        "big_rows": lambda row: row["v"] >= 8,
        "count": lambda ds: ds.count(),
    }
    assert Flow.from_config(spec, registry).run() == {"out": 3}  # 8, 10, 12


def test_errors(ray_session):
    f = Flow().source("in", _src)
    with pytest.raises(ValueError, match="duplicate"):
        f.source("in", _src)
    with pytest.raises(ValueError, match="unknown upstream"):
        f.stage("x", "nope", _double)


def test_cache_fanout_materializes_shared_node(ray_session):
    flow = (
        Flow(cache_fanout=True)
        .source("in", _src)
        .stage("doubled", "in", _double)
        .filter("a", "doubled", "k == 'a'")
        .filter("b", "doubled", "k == 'b'")
        .union("u", ["a", "b"])
        .sink("out", "u", lambda ds: ds.count())
    )
    assert flow.run() == {"out": 5}
