import zlib

import numpy as np
import pyarrow as pa

from nifi_ray.util.hashing import (
    add_partition_column,
    crc32_of_strings,
    partition_of,
    state_checksum,
)


def test_crc32_matches_zlib():
    vals = ["", "a", "doc00000042", "héllo wörld", "x" * 300]
    got = crc32_of_strings(pa.array(vals))
    want = [zlib.crc32(v.encode()) for v in vals]
    assert got.tolist() == want


def test_crc32_chunked_and_sliced():
    arr = pa.chunked_array([pa.array(["aa", "bb"]), pa.array(["cc"])])
    assert crc32_of_strings(arr).tolist() == [zlib.crc32(b"aa"), zlib.crc32(b"bb"), zlib.crc32(b"cc")]
    sliced = pa.array(["xx", "yy", "zz"]).slice(1, 2)
    assert crc32_of_strings(sliced).tolist() == [zlib.crc32(b"yy"), zlib.crc32(b"zz")]


def test_partition_stable_and_in_range():
    ids = pa.array([f"doc{i:010d}" for i in range(1000)])
    p1 = partition_of(ids, 16)
    p2 = partition_of(ids, 16)
    assert (p1 == p2).all()
    assert p1.min() >= 0 and p1.max() < 16
    # roughly balanced
    counts = np.bincount(p1, minlength=16)
    assert counts.min() > 20


def test_add_partition_column():
    t = pa.table({"doc_id": ["a", "b"], "x": [1, 2]})
    out = add_partition_column(t, 8)
    assert out.schema.names == ["doc_id", "x", "partition_id"]
    assert out["partition_id"].type == pa.int32()


def test_state_checksum_order_insensitive():
    t1 = pa.table(
        {
            "doc_id": ["a", "b", "c"],
            "tokens": [[1, 2, 3], [4], []],
            "n_tok": pa.array([3, 1, 0], pa.int32()),
        }
    )
    t2 = t1.take(pa.array([2, 0, 1]))
    assert state_checksum(t1) == state_checksum(t2)
    t3 = pa.table(
        {
            "doc_id": ["a", "b", "c"],
            "tokens": [[1, 2, 4], [4], []],
            "n_tok": pa.array([3, 1, 0], pa.int32()),
        }
    )
    assert state_checksum(t1) != state_checksum(t3)
    assert state_checksum(t1.slice(0, 0)) == 0
