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


def test_commit_is_exclusive(tmp_path):
    """Two writers racing the same version: exactly one commit wins,
    the loser gets a retryable error (optimistic concurrency) — os.replace
    would silently drop the winner's files from the chain."""
    import pytest

    from nifi_ray.schema import BASE_SCHEMA
    from nifi_ray.state.manifest import Manifest, commit_manifest, load_manifest

    lake = str(tmp_path)
    mk = lambda tag: Manifest(
        version=1,
        num_partitions=2,
        schema_version=1,
        schema=BASE_SCHEMA,
        applied_through=0,
        partitions={"0": {"file": f"{tag}-0.parquet"}},
    )
    commit_manifest(lake, mk("winner"))
    with pytest.raises(ValueError, match="concurrently|not newer"):
        commit_manifest(lake, mk("loser"))
    assert load_manifest(lake, 1).partitions[0]["file"] == "winner-0.parquet"
    # no tmp litter
    import os

    mdir = os.path.join(lake, "_manifest")
    assert [f for f in os.listdir(mdir) if ".tmp." in f] == []

    # true race: the other writer lands BETWEEN the version pre-check
    # and the link (pre-create v2's path, pin the pre-check's view of
    # latest_version to v1) → the EEXIST branch must fire and clean up
    from unittest import mock

    from nifi_ray.state import manifest as mmod

    racer = mk("racer")
    racer.version = 2
    with open(mmod.manifest_path(lake, 2), "w") as f:
        f.write(mk("other").to_json())
    with mock.patch.object(mmod, "latest_version", return_value=1):
        with pytest.raises(ValueError, match="concurrently"):
            mmod.commit_manifest(lake, racer)
    assert [f for f in os.listdir(mdir) if ".tmp." in f] == []
