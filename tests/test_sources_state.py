import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from nifi_ray.sources.listing import ListingState, list_new_files
from nifi_ray.stages.codec import compress, modify_bytes
from nifi_ray.stages.validate import in_range, matches_regex, not_null, validate


def _mk(dir_, name, mtime=None):
    p = os.path.join(dir_, name)
    with open(p, "w") as f:
        f.write(name)
    if mtime is not None:
        os.utime(p, (mtime, mtime))
    return p


def test_listing_watermark(tmp_path):
    d = str(tmp_path / "in")
    os.makedirs(d)
    state = str(tmp_path / "state.json")
    t0 = time.time() - 100
    a = _mk(d, "a.parquet", t0)
    b = _mk(d, "b.parquet", t0 + 10)
    assert list_new_files(d, state) == [a, b]
    # nothing new
    assert list_new_files(d, state) == []
    # new file later
    c = _mk(d, "c.parquet", t0 + 20)
    assert list_new_files(d, state) == [c]
    # same-mtime tie: new file with SAME mtime as watermark must appear,
    # already-seen one must not
    d2 = _mk(d, "d.parquet", t0 + 20)
    got = list_new_files(d, state)
    assert got == [d2]


def test_listing_commit_false(tmp_path):
    d = str(tmp_path / "in")
    os.makedirs(d)
    state = str(tmp_path / "state.json")
    _mk(d, "a.parquet", time.time() - 5)
    first = list_new_files(d, state, commit=False)
    assert len(first) == 1
    # not committed → listed again (at-least-once until commit)
    assert list_new_files(d, state) == first


def test_validate_rules():
    t = pa.table(
        {
            "doc_id": ["doc1", None, "x!", "doc4"],
            "n": pa.array([5, 3, 99, -1], pa.int64()),
        }
    )
    out = validate(
        {
            "id_present": not_null("doc_id"),
            "id_format": matches_regex("doc_id", r"doc\d+"),
            "n_range": in_range("n", 0, 50),
        }
    )(t)
    assert out["valid"].to_pylist() == [True, False, False, False]
    reasons = out["invalid_reason"].to_pylist()
    assert reasons[0] is None
    assert "id_present" in reasons[1] and "id_format" in reasons[1]
    assert reasons[2] == "id_format,n_range"
    assert reasons[3] == "n_range"


def test_codecs_roundtrip():
    t = pa.table({"payload": [b"hello world" * 10, None]})
    for codec in ("gzip", "bzip2", "lzma"):
        c = compress("payload", codec, out="z")(t)
        assert c["z"][1].as_py() is None
        back = compress("z", codec, out="orig", mode="decompress")(c)
        assert back["orig"][0].as_py() == b"hello world" * 10
    trimmed = modify_bytes("payload", head=2, tail=3)(t)
    assert trimmed["payload"][0].as_py() == (b"hello world" * 10)[2:-3]


def test_cache_actor(ray_session):
    from nifi_ray.state.cache import CacheClient

    c = CacheClient(name="t_cache", shards=2, max_entries=3, eviction="FIFO")
    assert c.get_and_put_if_absent("k1", "v1") is None  # first writer
    assert c.get_and_put_if_absent("k1", "v2") == "v1"  # duplicate
    assert c.get("k1") == "v1"
    assert c.contains("k1")
    assert c.remove("k1") and not c.contains("k1")
    for i in range(10):
        c.put(f"x{i}", i)
    assert c.size() <= 6  # max_entries per shard enforced
    c.shutdown()


def test_cache_put_if_absent_many_batched(ray_session):
    # batched first-writer probe: one RPC per (batch x shard), results
    # in input order, consistent with the per-key atomic primitive
    from nifi_ray.state.cache import CacheClient

    c = CacheClient(name="t_cache_many", shards=3, max_entries=10_000)
    keys = [f"k{i % 5}" for i in range(12)]  # 5 distinct, repeats in-batch
    first = c.put_if_absent_many(keys)
    # exactly the first occurrence of each distinct key wins
    seen = set()
    expect = []
    for k in keys:
        expect.append(k not in seen)
        seen.add(k)
    assert first == expect
    # a second batch sees everything as duplicate
    assert c.put_if_absent_many(keys) == [False] * len(keys)
    # and agrees with the per-key primitive
    assert c.get_and_put_if_absent("k0", "v") is not None
    assert c.put_if_absent_many([]) == []
    c.shutdown()


def test_cache_detect_duplicate_stage(ray_session):
    # DetectDuplicate against the live cache: is_first marks the
    # cross-batch first sighting of each key exactly once
    import ray.data

    from nifi_ray.state.cache import CacheClient, CacheDetectDuplicate

    name = "t_cache_dd"
    ds = ray.data.from_items(
        [{"k": i % 7, "i": i} for i in range(50)]
    ).repartition(5)
    out = ds.map_batches(
        CacheDetectDuplicate,
        fn_constructor_args=(name,),
        fn_constructor_kwargs={"key_col": "k", "shards": 2},
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    assert int(out["is_first"].sum()) == 7  # one winner per distinct key
    # every key's winner set has exactly one row
    assert (out.groupby("k")["is_first"].sum() == 1).all()
    CacheClient(name=name, shards=2).shutdown()
