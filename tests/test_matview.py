"""Materialized aggregates (pipelines/matview.py): incremental GROUP BY
maintenance vs a full recompute oracle — create/refresh equivalence,
group migration / delete / re-insert, manifest pruning, rescale and
compaction between refreshes, expired-base full rebuild."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nifi_ray.gen import GenConfig, write_base, write_events
from nifi_ray.pipelines.cdc import CDCLake, _version_diff_plan
from nifi_ray.schema import BASE_SCHEMA, EVENT_SCHEMA

CFG = GenConfig(seed=77, n_docs=300, n_events=1800)

GROUP_BY = ["source"]
SUMS = ["n_tok", "token_sum"]
DERIVE = [["token_sum", "list_sum", "tokens"]]


def _expected(state: pa.Table) -> dict:
    """Sequential full-recompute oracle over a driver-side state table."""
    exp: dict = {}
    for i in range(state.num_rows):
        src = state["source"][i].as_py()
        toks = state["tokens"][i].as_py() or []
        n_docs, s_ntok, s_tok = exp.get(src, (0, 0, 0))
        exp[src] = (
            n_docs + 1,
            s_ntok + (state["n_tok"][i].as_py() or 0),
            s_tok + sum(toks),
        )
    return exp


def _got(view: pa.Table) -> dict:
    return {
        view["source"][i].as_py(): (
            view["n_docs"][i].as_py(),
            view["sum_n_tok"][i].as_py(),
            view["sum_token_sum"][i].as_py(),
        )
        for i in range(view.num_rows)
    }


def _check(lake: CDCLake, view: pa.Table):
    assert _got(view) == _expected(lake.read_table())
    # published snapshot is group-sorted and typed int64
    assert view["n_docs"].type == pa.int64()
    assert view["sum_n_tok"].type == pa.int64()
    srcs = view["source"].to_pylist()
    assert srcs == sorted(srcs)


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    d = tmp_path_factory.mktemp("matview")
    base_dir, ev_dir = str(d / "b"), str(d / "e")
    write_base(CFG, base_dir, shards=2)
    write_events(CFG, ev_dir, shards=3)
    return str(d), base_dir, ev_dir


def test_incremental_matches_full_recompute_across_ticks(ray_session, dirs):
    d, base_dir, ev_dir = dirs
    lake = CDCLake(os.path.join(d, "lake_ticks"))
    lake.init_from(base_dir, num_partitions=4)
    v0 = lake.create_aggregate("by_source", GROUP_BY, SUMS, DERIVE)
    _check(lake, v0)
    for hi in (600, 1200, None):
        lake.replay(ev_dir, lsn_hi=hi)
        _check(lake, lake.refresh_aggregate("by_source"))
    # snapshots are versioned per reflected lake version
    from nifi_ray.pipelines.matview import agg_versions

    assert agg_versions(lake.lake_dir, "by_source") == [1, 2, 3, 4]
    # time travel: the v2 snapshot still matches state at lake version 2
    import ray

    v2 = lake.read_aggregate("by_source", 2)
    t2 = pa.concat_tables(ray.get(lake.read(version=2).to_arrow_refs()))
    assert _got(v2) == _expected(t2)


def test_recreate_same_spec_is_idempotent_refresh(ray_session, dirs):
    d, base_dir, ev_dir = dirs
    lake = CDCLake(os.path.join(d, "lake_ticks"))  # built by previous test
    again = lake.create_aggregate("by_source", GROUP_BY, SUMS, DERIVE)
    _check(lake, again)
    with pytest.raises(FileExistsError):
        lake.create_aggregate("by_source", ["source"], ["n_tok"])


def test_group_migration_delete_reinsert_noop(ray_session, tmp_path):
    base = pa.table(
        {
            "doc_id": ["d1", "d2", "d3"],
            "tokens": [[1, 2], [3], [4, 5, 6]],
            "n_tok": [2, 1, 3],
            "source": ["A", "A", "B"],
        },
        schema=BASE_SCHEMA,
    )
    events = pa.table(
        {
            "lsn": [1, 2, 3, 4, 5, 6],
            "op": ["U", "D", "I", "D", "I", "U"],
            "doc_id": ["d1", "d2", "d4", "d3", "d3", "d4"],
            "tokens": [[7], None, [8, 9], None, [10], [8, 9]],
            "n_tok": [1, None, 2, None, 1, 2],
            # d1 migrates A→B; d2 deleted; d4 inserted in A;
            # d3 deleted then re-inserted in C; lsn 6 is a no-op image
            "source": ["B", None, "A", None, "C", "A"],
        },
        schema=EVENT_SCHEMA,
    )
    bd, ed = str(tmp_path / "b"), str(tmp_path / "e")
    os.makedirs(bd), os.makedirs(ed)
    pq.write_table(base, os.path.join(bd, "b.parquet"))
    pq.write_table(events, os.path.join(ed, "e.parquet"))
    lake = CDCLake(str(tmp_path / "lake"))
    lake.init_from(bd, num_partitions=2)
    view0 = lake.create_aggregate("v", GROUP_BY, SUMS, DERIVE)
    assert _got(view0) == {"A": (2, 3, 6), "B": (1, 3, 15)}
    lake.replay(ed)
    view = lake.refresh_aggregate("v")
    # final state: d1(B,[7]) d3(C,[10]) d4(A,[8,9])
    assert _got(view) == {"A": (1, 2, 17), "B": (1, 1, 7), "C": (1, 1, 10)}
    _check(lake, view)


def test_refresh_prunes_untouched_partitions(ray_session, tmp_path):
    """A tick touching one doc diff-plans ≤ a couple of partitions out
    of 16 — the O(delta) claim, asserted at the plan level."""
    cfg = GenConfig(seed=9, n_docs=400, n_events=1)
    bd, ed = str(tmp_path / "b"), str(tmp_path / "e")
    write_base(cfg, bd, shards=2)
    lake = CDCLake(str(tmp_path / "lake"))
    lake.init_from(bd, num_partitions=16)
    lake.create_aggregate("v", GROUP_BY, SUMS, DERIVE)
    ev = pa.table(
        {
            "lsn": [1000],
            "op": ["U"],
            "doc_id": ["solo-doc"],
            "tokens": [[42, 43]],
            "n_tok": [2],
            "source": ["web"],
        },
        schema=EVENT_SCHEMA,
    )
    os.makedirs(ed)
    pq.write_table(ev, os.path.join(ed, "e.parquet"))
    lake.replay(ed)
    m_old, m_new = lake.manifest(lake.manifest().version - 1), lake.manifest()
    items, same_p = _version_diff_plan(m_old, m_new)
    assert same_p and len(items) == 1
    _check(lake, lake.refresh_aggregate("v"))


def test_rescale_and_compaction_between_refreshes(ray_session, dirs):
    d, base_dir, ev_dir = dirs
    lake = CDCLake(os.path.join(d, "lake_rescale"))
    lake.init_from(base_dir, num_partitions=4)
    lake.create_aggregate("v", GROUP_BY, SUMS, DERIVE)
    lake.replay(ev_dir, lsn_hi=600, mode="delta")
    lake.rescale(6)  # gcd(4,6)=2 — the congruence cross-read path
    lake.replay(ev_dir, lsn_hi=1200, mode="delta")
    _check(lake, lake.refresh_aggregate("v"))
    before = _got(lake.read_aggregate("v"))
    lake.compact()  # state unchanged → delta must be exactly zero
    view = lake.refresh_aggregate("v")
    assert _got(view) == before
    _check(lake, view)


def test_expired_base_falls_back_to_full_rebuild(ray_session, dirs):
    from nifi_ray.state.manifest import expire_versions

    d, base_dir, ev_dir = dirs
    lake = CDCLake(os.path.join(d, "lake_expire"))
    lake.init_from(base_dir, num_partitions=4)
    lake.create_aggregate("v", GROUP_BY, SUMS, DERIVE)
    lake.replay(ev_dir, lsn_hi=900)
    lake.replay(ev_dir)
    from nifi_ray.state.manifest import retained_versions

    expire_versions(lake.lake_dir, keep_last=1)
    assert 1 not in retained_versions(lake.lake_dir)  # reflected version gone
    _check(lake, lake.refresh_aggregate("v"))


def test_refresh_without_create_raises(ray_session, dirs):
    d, base_dir, _ = dirs
    lake = CDCLake(os.path.join(d, "lake_ticks"))
    with pytest.raises(FileNotFoundError):
        lake.refresh_aggregate("nope")
