"""FTP list/fetch over a real loopback control+data connection
(ListFTP/FetchFTP analogs, sources/ftp.py)."""

import os
import time

import pyarrow as pa
import pytest

import ray
import ray.data

from nifi_ray.sources.ftp import FtpFetch, MiniFtpServer, list_ftp


@pytest.fixture()
def ftp_root(tmp_path):
    root = tmp_path / "ftproot"
    root.mkdir()
    for i in range(3):
        (root / f"f{i}.bin").write_bytes(f"payload-{i}".encode() * (i + 1))
    return root


def test_list_watermark_and_new_file(ftp_root, tmp_path):
    state = str(tmp_path / "state.json")
    with MiniFtpServer(str(ftp_root)) as srv:
        first = list_ftp("127.0.0.1", srv.port, "/", state)
        assert sorted(os.path.basename(p) for p in first) == ["f0.bin", "f1.bin", "f2.bin"]
        # nothing new → empty
        assert list_ftp("127.0.0.1", srv.port, "/", state) == []
        # a new file with a LATER mtime surfaces alone
        time.sleep(1.1)  # MDTM has 1s resolution
        (ftp_root / "f3.bin").write_bytes(b"late")
        third = list_ftp("127.0.0.1", srv.port, "/", state)
        assert [os.path.basename(p) for p in third] == ["f3.bin"]


def test_list_commit_false_does_not_advance(ftp_root, tmp_path):
    state = str(tmp_path / "state.json")
    with MiniFtpServer(str(ftp_root)) as srv:
        a = list_ftp("127.0.0.1", srv.port, "/", state, commit=False)
        b = list_ftp("127.0.0.1", srv.port, "/", state, commit=False)
        assert a == b and len(a) == 3


def test_fetch_stage_in_dataset(ray_session, ftp_root, tmp_path):
    state = str(tmp_path / "state.json")
    with MiniFtpServer(str(ftp_root)) as srv:
        paths = list_ftp("127.0.0.1", srv.port, "/", state)
        paths.append("/missing.bin")  # error-routing row
        ds = ray.data.from_arrow(
            pa.table({"path": pa.array(paths, pa.string())})
        ).map_batches(
            FtpFetch,
            fn_constructor_args=("127.0.0.1", srv.port),
            batch_format="pyarrow",
            concurrency=2,
        )
        out = ds.to_arrow_refs()
        t = pa.concat_tables([ray.get(r) for r in out]).sort_by("path")
        rows = {
            os.path.basename(p): (c, e)
            for p, c, e in zip(
                t["path"].to_pylist(), t["content"].to_pylist(), t["error"].to_pylist()
            )
        }
        for i in range(3):
            assert rows[f"f{i}.bin"][0] == f"payload-{i}".encode() * (i + 1)
            assert rows[f"f{i}.bin"][1] is None
        assert rows["missing.bin"][0] is None
        assert "550" in rows["missing.bin"][1] or "error" in rows["missing.bin"][1].lower()


def test_fetch_survives_reconnect(ftp_root):
    srv = MiniFtpServer(str(ftp_root))
    stage = FtpFetch("127.0.0.1", srv.port)
    batch = pa.table({"path": ["/f0.bin"]})
    assert stage(batch)["content"].to_pylist() == [b"payload-0"]
    # kill the server's side of the control channel; stage must reconnect
    srv.close()
    srv2 = MiniFtpServer(str(ftp_root))
    stage.port = srv2.port  # same host; new ephemeral port
    stage.host = "127.0.0.1"
    out = stage(batch)
    assert out["content"].to_pylist() == [b"payload-0"]
    assert out["error"].to_pylist() == [None]
    srv2.close()


def test_put_dot_rename_roundtrip(ray_session, tmp_path):
    """PutFTP two-phase upload (STOR .name → rename) then fetch back."""
    from nifi_ray.sources.ftp import FtpPut

    root = tmp_path / "putroot"
    root.mkdir()
    with MiniFtpServer(str(root)) as srv:
        rows = pa.table(
            {
                "path": [f"/out{i}.bin" for i in range(6)],
                "content": pa.array(
                    [f"payload {i}".encode() * (i + 1) for i in range(6)], pa.binary()
                ),
            }
        )
        out = ray.data.from_arrow(rows).map_batches(
            FtpPut,
            fn_constructor_args=("127.0.0.1", srv.port),
            batch_format="pyarrow",
            concurrency=2,
            batch_size=2,
        ).take_all()
        assert all(r["error"] is None for r in out)
        names = sorted(p.name for p in root.iterdir())
        assert names == [f"out{i}.bin" for i in range(6)]  # no dot-temps left
        for i in range(6):
            assert (root / f"out{i}.bin").read_bytes() == f"payload {i}".encode() * (i + 1)
        # and the fetch side reads them back over the same wire
        got = FtpFetch("127.0.0.1", srv.port)(pa.table({"path": ["/out3.bin"]}))
        assert got["content"].to_pylist() == [b"payload 3" * 4]


def test_put_error_routes(tmp_path):
    from nifi_ray.sources.ftp import FtpPut

    root = tmp_path / "putroot2"
    root.mkdir()
    with MiniFtpServer(str(root)) as srv:
        stage = FtpPut("127.0.0.1", srv.port)
        out = stage(
            pa.table(
                {
                    "path": ["/no_dir_here/x.bin", "/ok.bin"],
                    "content": pa.array([b"a", b"b"], pa.binary()),
                }
            )
        )
        errs = out["error"].to_pylist()
        assert errs[0] is not None and errs[1] is None
        assert (root / "ok.bin").read_bytes() == b"b"


def test_graded_fixture_content_deterministic(tmp_path):
    from nifi_ray.sources.ftp import ftp_fixture_content, write_ftp_fixture

    assert ftp_fixture_content(0) == ftp_fixture_content(0)
    assert len(ftp_fixture_content(5)) == 135
    paths = write_ftp_fixture(str(tmp_path), 4)
    assert paths == ["/f000.bin", "/f001.bin", "/f002.bin", "/f003.bin"]
    assert (tmp_path / "f002.bin").read_bytes() == ftp_fixture_content(2)
