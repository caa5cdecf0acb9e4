import os

import pyarrow as pa
import pyarrow.csv as pacsv

from nifi_ray.gen import GenConfig, events_table
from nifi_ray.schema import EVENT_SCHEMA
from nifi_ray.sources.formats import (
    convert_record,
    events_to_csv_table,
    read_events_csv,
    read_events_json,
)

CFG = GenConfig(seed=9, n_docs=40, n_events=200)


def test_csv_roundtrip(ray_session, tmp_path):
    ev = events_table(CFG)
    csv_tbl = events_to_csv_table(ev)
    path = str(tmp_path / "events.csv")
    pacsv.write_csv(csv_tbl, path)
    ds = read_events_csv(path)
    got = ds.take_all()
    back = pa.Table.from_pylist(got, schema=EVENT_SCHEMA).sort_by("lsn")
    assert back.equals(ev)


def test_json_roundtrip(ray_session, tmp_path):
    import json

    ev = events_table(CFG)
    path = str(tmp_path / "events.json")
    with open(path, "w") as f:
        for r in ev.to_pylist():
            f.write(json.dumps(r) + "\n")
    ds = read_events_json(path)
    back = pa.Table.from_pylist(ds.take_all(), schema=EVENT_SCHEMA).sort_by("lsn")
    assert back.equals(ev)


def test_convert_record():
    t = pa.table({"b": [1, 2], "a": ["x", "y"]})
    target = pa.schema([("a", pa.string()), ("b", pa.int32()), ("c", pa.float64())])
    out = convert_record(t, target)
    assert out.schema.equals(target)
    assert out["b"].to_pylist() == [1, 2]
    assert out["c"].null_count == 2


def test_orc_roundtrip(ray_session, tmp_path):
    """parquet → Dataset → ORC files → distributed ORC read → same data
    (ConvertAvroToORC analog)."""
    import ray.data as rd

    from nifi_ray.sources.formats import read_orc, write_orc

    t = pa.table(
        {
            "id": pa.array(range(500), pa.int64()),
            "v": pa.array([i * 0.5 for i in range(500)], pa.float64()),
            "s": pa.array([f"row{i}" for i in range(500)], pa.string()),
        }
    )
    ds = rd.from_arrow(t).repartition(4)
    out = str(tmp_path / "orc_out")
    nfiles = write_orc(ds, out)
    assert nfiles == 4
    import glob
    files = sorted(glob.glob(out + "/*.orc"))
    assert len(files) == 4 and not glob.glob(out + "/.*tmp")
    back = read_orc(files, columns=["id", "v"])
    got = back.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(got.columns) == ["id", "v"]
    assert got["id"].tolist() == list(range(500))
    assert got["v"].sum() == t["v"].to_pandas().sum()
