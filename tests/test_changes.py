"""Change feed (CDCLake.changes): snapshot diff between retained
versions — I/U/D vs a sequential dict diff, no-op exclusion, manifest
pruning, delta overlays, and the cross-rescale congruence path."""

import pyarrow as pa
import pytest

from nifi_ray.gen import GenConfig, base_table, write_base, write_events
from nifi_ray.pipelines.cdc import CDCLake, _diff_snapshots

CFG = GenConfig(seed=31, n_docs=200, n_events=1200)


def _as_map(t: pa.Table) -> dict:
    return {
        t["doc_id"][i].as_py(): (
            tuple(t["tokens"][i].as_py() or []),
            t["n_tok"][i].as_py(),
            t["source"][i].as_py(),
        )
        for i in range(t.num_rows)
    }


def _expected_diff(old: dict, new: dict) -> dict:
    exp = {}
    for k in new:
        if k not in old:
            exp[k] = ("I", new[k])
        elif new[k] != old[k]:
            exp[k] = ("U", new[k])
    for k in old:
        if k not in new:
            exp[k] = ("D", old[k])
    return exp


def _got_map(ds) -> dict:
    t = pa.Table.from_pandas(ds.to_pandas())
    return {
        t["doc_id"][i].as_py(): (
            t["change_op"][i].as_py(),
            (
                tuple(t["tokens"][i].as_py() or []),
                t["n_tok"][i].as_py(),
                t["source"][i].as_py(),
            ),
        )
        for i in range(t.num_rows)
    }


@pytest.fixture(scope="module")
def lake(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("changes")
    base_dir, ev_dir, lake_dir = str(d / "b"), str(d / "e"), str(d / "l")
    write_base(CFG, base_dir, shards=2)
    write_events(CFG, ev_dir, shards=3)
    lk = CDCLake(lake_dir)
    lk.init_from(base_dir, num_partitions=4)  # v1
    lk.replay(ev_dir, lsn_hi=600)  # v2 (cow)
    lk.replay(ev_dir, mode="delta")  # v3 (live deltas → MOR snapshot)
    return lk


def test_changes_full_span_matches_sequential_diff(lake):
    old = _as_map(base_table(CFG))
    new = _as_map(lake.read_table())
    exp = _expected_diff(old, new)
    got = _got_map(lake.changes(1, 3))
    assert got == exp
    assert set(v[0] for v in got.values()) == {"I", "U", "D"}


def test_changes_incremental_spans_compose(lake):
    """v1→v2 changed-doc set ∪ v2→v3 set ⊇ v1→v3 set, and docs changed
    only in one span appear only there (net-diff semantics)."""
    g12, g23, g13 = (
        _got_map(lake.changes(1, 2)),
        _got_map(lake.changes(2, 3)),
        _got_map(lake.changes(1, 3)),
    )
    assert set(g13) <= set(g12) | set(g23)
    # a doc changed in span 1 and reverted in span 2 would drop from g13;
    # every doc in g13 carries its final image from the later span
    for doc, (op, img) in g13.items():
        if doc in g23 and g23[doc][0] != "D":
            assert g23[doc][1] == img


def test_changes_same_version_empty_and_pruned(lake):
    ds = lake.changes(3, 3)
    assert ds.count() == 0
    # pruning: identical manifests → zero diff tasks (no blocks read)
    assert ds.num_blocks() <= 1  # single empty-table block, no per-partition items


def test_changes_delete_carries_preimage(lake):
    old = _as_map(base_table(CFG))
    for doc, (op, img) in _got_map(lake.changes(1, 3)).items():
        if op == "D":
            assert img == old[doc]


def test_changes_across_rescale(lake):
    before = _got_map(lake.changes(1, 3))
    lake.rescale(6)  # 4 → 6: gcd 2, non-multiple congruence path
    v = lake.manifest().version
    after = _got_map(lake.changes(1, v))
    assert after == before


def test_changes_missing_version_raises(lake):
    with pytest.raises(FileNotFoundError):
        lake.changes(99)


def test_diff_snapshots_noop_rows_excluded():
    schema = pa.schema(
        [
            pa.field("doc_id", pa.string()),
            pa.field("tokens", pa.list_(pa.int32())),
            pa.field("n_tok", pa.int32()),
            pa.field("source", pa.string()),
        ]
    )
    old = pa.table(
        {
            "doc_id": ["a", "b", "c"],
            "tokens": [[1, 2], [3], [4, 5]],
            "n_tok": [2, 1, 2],
            "source": ["web", "web", "code"],
        },
        schema=schema,
    )
    new = pa.table(
        {
            "doc_id": ["a", "b", "d"],
            "tokens": [[2, 1], [3], [9]],
            "n_tok": [2, 1, 1],
            "source": ["web", "web", "wiki"],
        },
        schema=schema,
    )
    out = _diff_snapshots(old, new)
    got = {
        out["doc_id"][i].as_py(): out["change_op"][i].as_py()
        for i in range(out.num_rows)
    }
    # a: token ORDER changed → U; b: identical → excluded; c: gone → D; d: new → I
    assert got == {"a": "U", "c": "D", "d": "I"}


def test_suffix_fast_path_fires_and_matches_slow_path(ray_session, tmp_path, monkeypatch):
    """A pure delta-append span must take the O(delta) suffix read path
    (counted via monkeypatch) and produce the identical change feed to
    the full-snapshot diff of an equivalent COW lake."""
    import os

    import ray

    from nifi_ray.gen import write_base as wb, write_events as we
    from nifi_ray.pipelines import cdc as cdcmod

    b, e = str(tmp_path / "b"), str(tmp_path / "e")
    wb(CFG, b, shards=2)
    we(CFG, e, shards=2)

    mor = CDCLake(str(tmp_path / "mor"))
    mor.init_from(b, num_partitions=4)
    mor.replay(e, mode="delta")      # v2: suffix-shaped span v1→v2

    cow = CDCLake(str(tmp_path / "cow"))
    cow.init_from(b, num_partitions=4)
    cow.replay(e)                    # v2 via full-partition rewrite

    # the diff plan marks every touched partition suffix-shaped (the
    # branch diff_items takes is a pure function of this plan; the
    # worker-side call itself can't be counted from the driver)
    items, _sp = cdcmod._version_diff_plan(mor.manifest(1), mor.manifest(2))
    assert items and all(r["suffix_deltas"] for r in items)

    fast = pa.concat_tables(ray.get(mor.changes(1, 2).to_arrow_refs()))
    slow = pa.concat_tables(ray.get(cow.changes(1, 2).to_arrow_refs()))

    def key(t):
        return {
            (t["doc_id"][i].as_py(), t["change_op"][i].as_py()): tuple(
                t["tokens"][i].as_py() or []
            )
            for i in range(t.num_rows)
        }

    assert key(fast) == key(slow)
