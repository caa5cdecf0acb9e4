"""Socket/mail push egress (PutTCP/PutUDP/PutSyslog/PutEmail analogs)
— loopback end-to-end against this repo's own listeners: drive a
Dataset through the actor-pool sink, then read the receiving
listener's spool back and compare payloads."""

import time

import pyarrow as pa
import pytest

from nifi_ray.sources.listen import ListenSMTP, ListenTCP, ListenUDP, spool_dataset
from nifi_ray.stages.egress import (
    EmailPut,
    SyslogPut,
    TcpPut,
    UdpPut,
    format_syslog,
)


def _wait_rows(writer, n, timeout=10.0):
    t0 = time.time()
    while writer.rows_written + writer.rows_buffered < n:
        if time.time() - t0 > timeout:
            raise TimeoutError(f"{writer.rows_written}+{writer.rows_buffered} < {n}")
        time.sleep(0.02)


def test_tcp_put_roundtrip(tmp_path, ray_session):
    import ray.data

    spool = str(tmp_path / "spool")
    with ListenTCP(spool) as srv:
        ds = ray.data.from_arrow(
            pa.table({"content": [f"msg {i}" for i in range(200)]})
        )
        out = ds.map_batches(
            TcpPut,
            fn_constructor_kwargs={"host": "127.0.0.1", "port": srv.port},
            concurrency=2,
            batch_format="pyarrow",
        ).take_all()
        assert len(out) == 200 and all(r["sent"] for r in out)
        assert all(r["error"] is None for r in out)
        _wait_rows(srv.writer, 200)
    got = {r["payload"] for r in spool_dataset(spool).take_all()}
    assert got == {f"msg {i}" for i in range(200)}


def test_tcp_put_dead_endpoint_routes_failure(ray_session):
    import socket

    import ray.data

    # grab a port that is closed
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    ds = ray.data.from_arrow(pa.table({"content": ["a", None]}))
    out = ds.map_batches(
        TcpPut,
        fn_constructor_kwargs={"host": "127.0.0.1", "port": port, "timeout": 0.5},
        concurrency=1,
        batch_format="pyarrow",
    ).take_all()
    assert [r["sent"] for r in out] == [False, False]
    assert "null content" in {r["error"] for r in out}


def test_udp_put_datagrams_and_size_cap(tmp_path, ray_session):
    import ray.data

    spool = str(tmp_path / "spool")
    with ListenUDP(spool) as srv:
        tbl = pa.table({"content": [f"dgram {i}" for i in range(50)] + ["x" * 70000]})
        out = (
            ray.data.from_arrow(tbl)
            .map_batches(
                UdpPut,
                fn_constructor_kwargs={"host": "127.0.0.1", "port": srv.port},
                concurrency=1,
                batch_format="pyarrow",
            )
            .take_all()
        )
        assert sum(r["sent"] for r in out) == 50
        big = [r for r in out if not r["sent"]][0]
        assert "too large" in big["error"]
        _wait_rows(srv.writer, 50)
    got = {r["payload"] for r in spool_dataset(spool).take_all()}
    assert got == {f"dgram {i}" for i in range(50)}


def test_format_syslog_validation():
    tbl = pa.table(
        {
            "pri": [34, -1, 13, None],
            "ts": ["2026-08-18T00:00:00Z", "t", "", "t"],
            "host": ["h1", "h2", "h3", "h4"],
            "body": ["hello", "b", "b", "b"],
        }
    )
    out = format_syslog(tbl)
    assert out["syslog_valid"].to_pylist() == [True, False, False, False]
    assert out["syslog_line"][0].as_py() == "<34>1 2026-08-18T00:00:00Z h1 hello"
    # string-typed priority column: non-numeric = invalid, not a raise
    tbl2 = pa.table(
        {"pri": ["34", "abc"], "ts": ["t", "t"], "host": ["h", "h"], "body": ["b", "b"]}
    )
    out2 = format_syslog(tbl2, version=None)
    assert out2["syslog_valid"].to_pylist() == [True, False]
    assert out2["syslog_line"][0].as_py() == "<34>t h b"


def test_syslog_put_sends_valid_skips_invalid(tmp_path, ray_session):
    import ray.data

    from nifi_ray.stages.parsers import ParseSyslog

    spool = str(tmp_path / "spool")
    with ListenTCP(spool) as srv:  # ListenSyslog(proto="tcp") is this class
        # body carries the 5424 app/procid/msgid tail (PutSyslog's Message
        # Body is free-form; a full 5424 message puts those in the body)
        tbl = pa.table(
            {
                "pri": [34, 13, None],
                "ts": ["2026-08-18T00:00:00Z", "2026-08-18T00:00:01Z", "t"],
                "host": ["alpha", "beta", "gamma"],
                "body": ["app 7 ID1 - login ok", "app 8 ID2 - disk low", "never"],
            }
        )
        out = (
            ray.data.from_arrow(tbl)
            .map_batches(
                SyslogPut,
                fn_constructor_kwargs={"host": "127.0.0.1", "port": srv.port},
                concurrency=1,
                batch_format="pyarrow",
            )
            .take_all()
        )
        assert [r["sent"] for r in out] == [True, True, False]
        assert out[2]["error"] == "invalid syslog message"
        _wait_rows(srv.writer, 2)
    # parse what arrived with this repo's own RFC 5424 parser: the circle closes
    parsed = (
        spool_dataset(spool)
        .map_batches(
            ParseSyslog,
            fn_constructor_kwargs={"col": "payload"},
            concurrency=1,
            batch_format="pyarrow",
        )
        .take_all()
    )
    assert {(r["syslog_hostname"], r["syslog_body"]) for r in parsed} == {
        ("alpha", "login ok"),
        ("beta", "disk low"),
    }
    assert {r["syslog_severity"] for r in parsed} == {2, 5}  # 34=4*8+2, 13=1*8+5


def test_email_put_roundtrip_with_attachment(tmp_path, ray_session):
    import ray.data

    from nifi_ray.stages.parsers import ParseEmail

    spool = str(tmp_path / "spool")
    with ListenSMTP(spool) as srv:
        tbl = pa.table(
            {
                "mail_from": ["a@x.test", "b@x.test", None],
                "mail_to": ["ops@y.test", "ops@y.test,dev@y.test", "z@y.test"],
                "subject": ["hi", "report", "s"],
                "body": ["body one", "body two", "b"],
                "blob": [None, b"\x00\x01binary", None],
            }
        )
        out = (
            ray.data.from_arrow(tbl)
            .map_batches(
                EmailPut,
                fn_constructor_kwargs={
                    "host": "127.0.0.1",
                    "port": srv.port,
                    "attach_col": "blob",
                },
                concurrency=1,
                batch_format="pyarrow",
            )
            .take_all()
        )
        assert [r["sent"] for r in out] == [True, True, False]
        assert out[2]["error"] == "missing from/to address"
        _wait_rows(srv.writer, 2)
    rows = spool_dataset(spool).take_all()
    assert {r["mail_from"] for r in rows} == {"a@x.test", "b@x.test"}
    # two-recipient envelope recorded
    assert any("dev@y.test" in r["rcpt_to"] for r in rows)
    parsed = (
        spool_dataset(spool)
        .map_batches(
            ParseEmail,
            fn_constructor_kwargs={"col": "payload"},
            concurrency=1,
            batch_format="pyarrow",
        )
        .take_all()
    )
    by_subj = {r["email_subject"]: r for r in parsed}
    assert "hi" in by_subj and "report" in by_subj
    assert by_subj["hi"]["email_body"].strip() == "body one"


def test_amqp_put_publish_confirms_and_multiframe(tmp_path, ray_session):
    # PublishAMQP analog loopback: publisher-confirm mode (sent only
    # after the broker's Basic.Ack, which ListenAMQP sends only after
    # the durable spool append), multi-body-frame payloads, null rows
    # routed without a publish
    import ray.data

    from nifi_ray.sources.listen import ListenAMQP
    from nifi_ray.stages.egress import AmqpPut

    spool = str(tmp_path / "amqp_put")
    big = "B" * 200_000  # > frame_max → split across body frames
    with ListenAMQP(spool_dir=spool) as srv:
        ds = ray.data.from_items(
            [{"content": "m1"}, {"content": None}, {"content": big}, {"content": "m2"}]
        )
        out = ds.map_batches(
            AmqpPut,
            fn_constructor_args=("127.0.0.1", srv.port),
            fn_constructor_kwargs={"routing_key": "rk", "exchange": "ex"},
            batch_format="pyarrow",
            concurrency=1,
        ).to_pandas()
        assert sorted(out["sent"]) == [False, True, True, True]
        assert out.loc[~out["sent"], "error"].iloc[0] == "null content"
        _wait_rows(srv.writer, 3)
    got = spool_dataset(spool).to_pandas()
    assert sorted(got["payload"].str.slice(0, 2)) == ["BB", "m1", "m2"]
    assert set(got["routing_key"]) == {"rk"} and set(got["exchange"]) == {"ex"}
    assert got["confirmed"].all()  # every spooled row was confirm-acked
    assert got["payload"].str.len().max() == 200_000  # reassembled intact


def test_amqp_put_dead_endpoint_routes_failure(ray_session):
    import socket

    from nifi_ray.stages.egress import AmqpPut

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()  # nothing listening
    put = AmqpPut("127.0.0.1", port, timeout=0.5)
    out = put(pa.table({"content": ["x", "y"]}))
    assert out["sent"].to_pylist() == [False, False]
    assert all(e for e in out["error"].to_pylist())
