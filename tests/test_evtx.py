"""EVTX frame parsing (ParseEvtx analog): record framing, CRC checks,
bad-chunk routing, multi-chunk files."""

import struct

import pyarrow as pa

from nifi_ray.stages.evtx import parse_evtx, parse_evtx_bytes, write_evtx


def _recs(n, start_id=1):
    return [
        (start_id + i, 1_700_000_000_000_000 + i * 1_000_000, f"<Event><Id>{start_id+i}</Id></Event>")
        for i in range(n)
    ]


def test_roundtrip_single_chunk():
    blob = write_evtx(_recs(10))
    records, errors = parse_evtx_bytes(blob)
    assert errors == []
    assert [r["record_id"] for r in records] == list(range(1, 11))
    assert records[3]["payload_text"] == "<Event><Id>4</Id></Event>"
    assert records[5]["ts_us"] == 1_700_000_000_000_000 + 5_000_000


def test_multi_chunk_spill():
    big = [(i + 1, 1_700_000_000_000_000, "<E>" + "x" * 4000 + "</E>") for i in range(40)]
    blob = write_evtx(big)
    assert len(blob) > 2 * 65536
    records, errors = parse_evtx_bytes(blob)
    assert errors == []
    assert len(records) == 40
    assert max(r["chunk_index"] for r in records) >= 1


def test_corrupt_chunk_routes_not_raises():
    blob = bytearray(write_evtx(_recs(6)))
    blob[4096 + 512 + 30] ^= 0xFF  # flip a byte inside chunk 0's record data
    records, errors = parse_evtx_bytes(bytes(blob))
    assert records == []  # single corrupted chunk
    assert any("CRC mismatch" in e for e in errors)


def test_bad_magic():
    assert parse_evtx_bytes(b"NotEvtx" + b"\x00" * 100) == ([], ["bad file magic"])


def test_map_batches_stage_explodes():
    b1 = write_evtx(_recs(3))
    b2 = write_evtx(_recs(2, start_id=100))
    batch = pa.table(
        {"path": ["a.evtx", "b.evtx"], "content": pa.array([b1, b2], pa.binary())}
    )
    out = parse_evtx("content", keep_cols=["path"])(batch)
    assert out.num_rows == 5
    assert out["path"].to_pylist() == ["a.evtx"] * 3 + ["b.evtx"] * 2
    assert out["record_id"].to_pylist() == [1, 2, 3, 100, 101]
    assert all(e is None for e in out["chunk_errors"].to_pylist())


def test_graded_fixture_roundtrips_to_spec():
    # the dual-pinning contract behind the graded evtx_parse query:
    # parse(write(params)) == params, recomputed without parsing
    from nifi_ray.stages.evtx import (
        evtx_fixture_records,
        parse_evtx_bytes,
        synth_evtx_table,
    )

    t = synth_evtx_table(8, seed=3)
    for i in range(8):
        recs, errs = parse_evtx_bytes(t["content"][i].as_py())
        assert errs == []
        spec = evtx_fixture_records(i, seed=3)
        assert [(r["record_id"], r["ts_us"], r["payload_text"]) for r in recs] == spec
