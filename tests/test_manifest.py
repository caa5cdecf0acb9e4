import os

import pyarrow as pa
import pytest

from nifi_ray.schema import BASE_SCHEMA
from nifi_ray.state.manifest import (
    Manifest,
    commit_manifest,
    gc_orphans,
    latest_version,
    load_manifest,
)


def _mk(version, lake):
    return Manifest(
        version=version,
        num_partitions=4,
        schema_version=1,
        schema=BASE_SCHEMA,
        applied_through=version * 100,
        partitions={0: {"file": "p=00000/part-v000001.parquet", "rows": 1, "max_lsn": 5, "token_hash": 7}},
    )


def test_commit_load_roundtrip(tmp_path):
    lake = str(tmp_path)
    assert load_manifest(lake) is None
    m = _mk(1, lake)
    commit_manifest(lake, m)
    got = load_manifest(lake)
    assert got.version == 1
    assert got.schema.equals(BASE_SCHEMA)
    assert got.partitions[0]["rows"] == 1
    assert got.applied_through == 100


def test_monotonic_versions(tmp_path):
    lake = str(tmp_path)
    commit_manifest(lake, _mk(1, lake))
    commit_manifest(lake, _mk(2, lake))
    assert latest_version(lake) == 2
    with pytest.raises(ValueError):
        commit_manifest(lake, _mk(2, lake))


def test_uncommitted_tmp_ignored(tmp_path):
    lake = str(tmp_path)
    commit_manifest(lake, _mk(1, lake))
    # simulate a crash mid phase-2: a .tmp manifest left behind
    with open(os.path.join(lake, "_manifest", "v000002.json.tmp.999"), "w") as f:
        f.write("{}")
    assert latest_version(lake) == 1


def test_gc_orphans(tmp_path):
    lake = str(tmp_path)
    os.makedirs(os.path.join(lake, "p=00000"))
    live = os.path.join(lake, "p=00000", "part-v000001.parquet")
    orphan = os.path.join(lake, "p=00000", "part-v000009.parquet")
    for p in (live, orphan):
        with open(p, "wb") as f:
            f.write(b"x")
    commit_manifest(lake, _mk(1, lake))
    removed = gc_orphans(lake)
    assert removed == [os.path.join("p=00000", "part-v000009.parquet")]
    assert os.path.exists(live) and not os.path.exists(orphan)
