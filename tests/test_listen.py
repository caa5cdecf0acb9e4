"""Push-source edges (ListenTCP/UDP/Syslog/HTTP) and the HTTP fetch
stage — loopback end-to-end: push over the real socket, read the spool
back as a Dataset, and consume it with the offset-tracking consumer."""

import http.client
import os
import socket
import threading
import time

import pyarrow as pa
import pytest

from nifi_ray.sources.listen import (
    ListenHTTP,
    ListenSyslog,
    ListenTCP,
    ListenUDP,
    SpoolWriter,
    spool_dataset,
)


def _wait_rows(writer, n, timeout=10.0):
    t0 = time.time()
    while writer.rows_written + writer.rows_buffered < n:
        if time.time() - t0 > timeout:
            raise TimeoutError(
                f"{writer.rows_written}+{writer.rows_buffered} < {n}"
            )
        time.sleep(0.02)


def test_tcp_roundtrip_multi_connection(tmp_path, ray_session):
    spool = str(tmp_path / "spool")
    with ListenTCP(spool, segment_rows=100) as srv:
        def push(k):
            c = socket.create_connection(("127.0.0.1", srv.port))
            c.sendall(b"".join(f"conn{k} line{i}\n".encode() for i in range(150)))
            c.close()

        ts = [threading.Thread(target=push, args=(k,)) for k in range(3)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        _wait_rows(srv.writer, 450)
    ds = spool_dataset(spool)
    rows = ds.take_all()
    assert len(rows) == 450
    assert {r["payload"] for r in rows} == {
        f"conn{k} line{i}" for k in range(3) for i in range(150)
    }
    # offsets dense 0..449, sender recorded, rotation sealed full segments
    assert sorted(r["offset"] for r in rows) == list(range(450))
    assert all(r["sender"] == "127.0.0.1" for r in rows)
    segs = os.listdir(os.path.join(spool, "partition=0"))
    assert len([s for s in segs if s.endswith(".parquet")]) >= 4


def test_spool_writer_resumes_offsets(tmp_path):
    spool = str(tmp_path / "spool")
    w = SpoolWriter(spool, segment_rows=10)
    for i in range(25):
        w.append({"payload": f"a{i}"})
    w.flush()
    # "restarted listener" continues the offset stream
    w2 = SpoolWriter(spool, segment_rows=10)
    assert w2.rows_written == 25
    w2.append({"payload": "resumed"})
    w2.flush()
    import pyarrow.parquet as pq
    import glob

    t = pa.concat_tables(
        pq.read_table(f)
        for f in sorted(glob.glob(os.path.join(spool, "partition=0", "*.parquet")))
    )
    assert t.num_rows == 26
    assert t["offset"].to_pylist() == list(range(26))


def test_udp_datagrams(tmp_path, ray_session):
    spool = str(tmp_path / "spool")
    with ListenUDP(spool) as srv:
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for i in range(40):
            s.sendto(f"dgram {i}".encode(), ("127.0.0.1", srv.port))
        s.close()
        _wait_rows(srv.writer, 40)
    rows = spool_dataset(spool).take_all()
    assert {r["payload"] for r in rows} == {f"dgram {i}" for i in range(40)}
    assert all(r["proto"] == "udp" for r in rows)


def test_syslog_listener_parses_downstream(tmp_path, ray_session):
    from nifi_ray.stages.parsers import ParseSyslog

    spool = str(tmp_path / "spool")
    with ListenSyslog(spool, proto="tcp") as srv:
        c = socket.create_connection(("127.0.0.1", srv.port))
        c.sendall(
            b"<34>Oct 11 22:14:15 web01 su[123]: auth failure\n"
            b"<165>1 2024-01-01T00:00:00Z app02 myapp 77 ID47 - started\n"
            b"not syslog at all\n"
        )
        c.close()
        _wait_rows(srv.writer, 3)
    parsed = (
        spool_dataset(spool)
        .map_batches(ParseSyslog("payload"), batch_format="pyarrow")
        .take_all()
    )
    by_host = {r["syslog_hostname"]: r for r in parsed if r["syslog_valid"]}
    assert by_host["web01"]["syslog_severity"] == 34 % 8
    assert by_host["web01"]["syslog_facility"] == 34 // 8
    assert by_host["app02"]["syslog_body"] == "started"
    assert sum(not r["syslog_valid"] for r in parsed) == 1


def test_http_listener_post(tmp_path, ray_session):
    spool = str(tmp_path / "spool")
    with ListenHTTP(spool) as srv:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port)
        for i in range(20):
            conn.request(
                "POST",
                f"/ingest/{i % 3}",
                body=f"doc {i}".encode(),
                headers={"Content-Type": "text/plain"},
            )
            assert conn.getresponse().status == 200
        conn.close()
        _wait_rows(srv.writer, 20)
    rows = spool_dataset(spool).take_all()
    assert len(rows) == 20
    assert {r["payload"] for r in rows} == {f"doc {i}" for i in range(20)}
    assert {r["path"] for r in rows} == {"/ingest/0", "/ingest/1", "/ingest/2"}
    assert all(r["content_type"] == "text/plain" for r in rows)


def test_spool_feeds_segment_consumer(tmp_path, ray_session):
    """The spool IS a single-producer topic: offset-tracked incremental
    consumption with commit-after-session, second poll empty."""
    from nifi_ray.sources.segments import SegmentConsumer

    spool = str(tmp_path / "spool")
    with ListenTCP(spool, segment_rows=50) as srv:
        c = socket.create_connection(("127.0.0.1", srv.port))
        c.sendall(b"".join(f"m{i}\n".encode() for i in range(120)))
        c.close()
        _wait_rows(srv.writer, 120)
    cons = SegmentConsumer(spool, str(tmp_path / "group.json"))
    ds, hi = cons.poll()
    assert ds.count() == 120
    cons.commit(hi)
    ds2, _ = cons.poll()
    assert ds2 is None or ds2.count() == 0


def test_http_fetch_stage(tmp_path, ray_session):
    """InvokeHTTP analog against a loopback server: statuses, bodies,
    and record-level error capture (unreachable port ⇒ -1, no raise)."""
    import http.server
    import socketserver

    import ray.data

    from nifi_ray.stages.http import HttpFetch

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path.startswith("/missing"):
                self.send_response(404)
                self.end_headers()
                return
            body = f"content of {self.path}".encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    class Srv(socketserver.ThreadingMixIn, http.server.HTTPServer):
        daemon_threads = True

    srv = Srv(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        urls = [f"http://127.0.0.1:{port}/doc/{i}" for i in range(10)]
        urls += [f"http://127.0.0.1:{port}/missing", "http://127.0.0.1:1/dead"]
        ds = ray.data.from_items([{"url": u} for u in urls]).map_batches(
            HttpFetch("url"), batch_format="pyarrow", concurrency=2, batch_size=4
        )
        rows = sorted(ds.take_all(), key=lambda r: r["url"])
        ok = [r for r in rows if r["status_code"] == 200]
        assert len(ok) == 10
        for r in ok:
            path = r["url"].split(str(port), 1)[1]
            assert r["response_body"] == f"content of {path}".encode()
        assert sum(r["status_code"] == 404 for r in rows) == 1
        dead = [r for r in rows if r["url"].endswith("/dead")]
        assert dead[0]["status_code"] == -1 and dead[0]["error"]
    finally:
        srv.shutdown()
        srv.server_close()


def test_smtp_listener_to_parse_email(tmp_path, ray_session):
    """smtplib → ListenSMTP spool → ParseEmail stage: the email-bundle
    ingest edge composed with the distributed parse."""
    import smtplib
    from email.message import EmailMessage

    from nifi_ray.sources.listen import ListenSMTP, spool_dataset
    from nifi_ray.stages.parsers import ParseEmail

    spool = str(tmp_path / "smtp_spool")
    with ListenSMTP(spool, segment_rows=2) as srv:
        with smtplib.SMTP("127.0.0.1", srv.port, timeout=10) as c:
            for i in range(3):
                msg = EmailMessage()
                msg["From"] = f"sender{i}@example.com"
                msg["To"] = "dest@example.com"
                msg["Subject"] = f"subject {i}"
                msg.set_content(f"body line {i}\n.leading dot survives")
                c.send_message(msg)
    ds = spool_dataset(spool)
    rows = ds.take_all()
    assert len(rows) == 3
    assert all(r["proto"] == "smtp" for r in rows)
    assert sorted(r["mail_from"] for r in rows) == [
        f"sender{i}@example.com" for i in range(3)
    ]
    assert all(r["rcpt_to"] == "dest@example.com" for r in rows)
    # dot-unstuffed body intact, then the distributed parse extracts headers
    parsed = ds.map_batches(
        ParseEmail, fn_constructor_args=("payload",), batch_format="pyarrow",
        concurrency=1,
    ).take_all()
    assert sorted(p["email_subject"] for p in parsed) == [f"subject {i}" for i in range(3)]
    assert any(".leading dot survives" in p["email_body"] for p in parsed)


def test_smtp_rset_and_oversize(tmp_path):
    import smtplib

    from nifi_ray.sources.listen import ListenSMTP, spool_dataset

    spool = str(tmp_path / "smtp2")
    with ListenSMTP(spool, max_message_bytes=64) as srv:
        c = smtplib.SMTP("127.0.0.1", srv.port, timeout=10)
        c.helo()
        c.mail("a@x"); c.rcpt("b@y")
        c.rset()  # abandons the envelope
        c.mail("c@x"); c.rcpt("d@y")
        code, _ = c.data(b"tiny")
        assert code == 250
        # oversize → 552, nothing spooled
        c.mail("e@x"); c.rcpt("f@y")
        code2, _ = c.data(b"Z" * 1000)
        assert code2 == 552
        c.quit()
    rows = spool_dataset(spool).take_all()
    assert len(rows) == 1
    assert rows[0]["mail_from"] == "c@x" and rows[0]["payload"].strip() == "tiny"


def _ws_client_connect(port, path="/feed"):
    """Minimal RFC 6455 client: handshake + masked-frame send."""
    import base64
    import os as _os
    import socket
    import struct

    s = socket.create_connection(("127.0.0.1", port), timeout=10)
    key = base64.b64encode(_os.urandom(16)).decode()
    s.sendall(
        (
            f"GET {path} HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
            f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n"
        ).encode()
    )
    resp = b""
    while b"\r\n\r\n" not in resp:
        resp += s.recv(4096)
    assert b"101" in resp.split(b"\r\n")[0]
    assert b"Sec-WebSocket-Accept" in resp

    def send(payload: bytes, op=0x1, fin=True, mask=b"\x01\x02\x03\x04"):
        b0 = (0x80 if fin else 0) | op
        ln = len(payload)
        if ln < 126:
            hdr = struct.pack("!BB", b0, 0x80 | ln)
        else:
            hdr = struct.pack("!BBH", b0, 0x80 | 126, ln)
        body = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
        s.sendall(hdr + mask + body)

    return s, send


def test_websocket_listener(tmp_path, ray_session):
    from nifi_ray.sources.listen import ListenWebSocket, spool_dataset

    spool = str(tmp_path / "ws_spool")
    with ListenWebSocket(spool, segment_rows=2) as srv:
        s, send = _ws_client_connect(srv.port)
        send(b"hello one")
        send(b"frag-", op=0x1, fin=False)
        send(b"mented", op=0x0, fin=True)   # continuation reassembly
        send(b"\x00\x01\x02", op=0x2)        # binary message
        # ping → pong comes back with the payload
        send(b"pp", op=0x9)
        pong = s.recv(4)
        assert pong[:2] == b"\x8a\x02" and pong[2:4] == b"pp"
        send(b"", op=0x8)                     # close handshake
        assert s.recv(2) == b"\x88\x00"
        s.close()
    rows = sorted(spool_dataset(spool).take_all(), key=lambda r: r["offset"])
    assert [r["payload"] for r in rows] == ["hello one", "frag-mented", "000102"]
    assert [r["opcode"] for r in rows] == ["text", "text", "binary"]
    assert all(r["path"] == "/feed" and r["proto"] == "ws" for r in rows)


def test_websocket_rejects_plain_http(tmp_path):
    import socket

    from nifi_ray.sources.listen import ListenWebSocket

    with ListenWebSocket(str(tmp_path / "ws2")) as srv:
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
        s.sendall(b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")
        assert b"400" in s.recv(1024)
        s.close()


def test_mqtt_listener(tmp_path, ray_session):
    """Raw MQTT 3.1.1 client: CONNECT/CONNACK, QoS0+QoS1 PUBLISH (PUBACK
    after spool accept), PING, DISCONNECT."""
    from nifi_ray.sources.listen import ListenMQTT, spool_dataset

    def enc_str(s):
        b = s.encode()
        return len(b).to_bytes(2, "big") + b

    spool = str(tmp_path / "mqtt_spool")
    with ListenMQTT(spool) as srv:
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=10)
        # CONNECT (protocol name MQTT, level 4, clean session)
        vh = enc_str("MQTT") + bytes([4, 0x02, 0, 60]) + enc_str("client-1")
        s.sendall(bytes([0x10, len(vh)]) + vh)
        assert s.recv(4) == b"\x20\x02\x00\x00"
        # QoS0 publishes on two topics
        for i in range(3):
            body = enc_str(f"sensors/t{i % 2}") + f"reading {i}".encode()
            s.sendall(bytes([0x30, len(body)]) + body)
        # QoS1 publish → PUBACK with the packet id
        body = enc_str("sensors/t9") + (42).to_bytes(2, "big") + b"qos1 payload"
        s.sendall(bytes([0x32, len(body)]) + body)
        assert s.recv(4) == b"\x40\x02\x00\x2a"
        # PINGREQ → PINGRESP, then DISCONNECT
        s.sendall(b"\xc0\x00")
        assert s.recv(2) == b"\xd0\x00"
        s.sendall(b"\xe0\x00")
        s.close()
        _wait_rows(srv.writer, 4)
    rows = sorted(spool_dataset(spool).take_all(), key=lambda r: r["offset"])
    assert [r["payload"] for r in rows] == [
        "reading 0", "reading 1", "reading 2", "qos1 payload",
    ]
    assert rows[0]["topic"] == "sensors/t0" and rows[3]["qos"] == 1
    assert all(r["proto"] == "mqtt" for r in rows)


def _relp_frame(txnr, command, data=b""):
    if data:
        return b"%d %s %d %s\n" % (txnr, command.encode(), len(data), data)
    return b"%d %s 0\n" % (txnr, command.encode())


def _read_relp_rsp(f):
    """Read one rsp frame off a socket file; returns (txnr, cmd, data)."""
    head = b""
    while head.count(b" ") < 3 and not head.endswith(b"\n"):
        b = f.read(1)
        assert b, f"EOF mid-rsp after {head!r}"
        head += b
    txnr, cmd, dlen = head.strip().split(b" ")[:3]
    data = b""
    if not head.endswith(b"\n"):
        data = f.read(int(dlen))
        assert f.read(1) == b"\n"
    return int(txnr), cmd.decode(), data


def test_relp_listener_durable_ack(tmp_path, ray_session):
    """RELP session: open (offers echoed), pipelined syslog frames
    acked only after the spool segment is sealed, close → serverclose."""
    from nifi_ray.sources.listen import ListenRELP, spool_dataset

    spool = str(tmp_path / "relp_spool")
    with ListenRELP(spool, ack_policy="durable") as srv:
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=10)
        f = s.makefile("rb")
        offers = b"relp_version=0\nrelp_software=test\ncommands=syslog"
        s.sendall(_relp_frame(1, "open", offers))
        txnr, cmd, data = _read_relp_rsp(f)
        assert (txnr, cmd) == (1, "rsp")
        assert data.startswith(b"200 OK\n") and b"commands=syslog" in data

        # pipeline 5 syslog events without reading acks
        msgs = [f"<13>Aug 17 10:0{i} host app: event {i}".encode() for i in range(5)]
        for i, m in enumerate(msgs):
            s.sendall(_relp_frame(2 + i, "syslog", m))
        acked = sorted(_read_relp_rsp(f)[0] for _ in range(5))
        assert acked == [2, 3, 4, 5, 6]
        # durable policy: everything acked is already SEALED (not buffered)
        assert srv.writer.rows_written == 5 and srv.writer.rows_buffered == 0

        s.sendall(_relp_frame(7, "close"))
        txnr, cmd, data = _read_relp_rsp(f)
        assert (txnr, data) == (7, b"200 OK")
        txnr, cmd, data = _read_relp_rsp(f)
        assert (txnr, cmd) == (0, "serverclose")
        s.close()

    rows = sorted(spool_dataset(spool).take_all(), key=lambda r: r["offset"])
    assert [r["txnr"] for r in rows] == [2, 3, 4, 5, 6]
    assert rows[0]["payload"].endswith("event 0")
    assert all(r["command"] == "syslog" and r["proto"] == "relp" for r in rows)


def test_relp_listener_accept_ack_and_malformed(tmp_path):
    """accept policy acks from the buffer; a malformed header drops the
    connection without acking (client retransmits)."""
    from nifi_ray.sources.listen import ListenRELP

    spool = str(tmp_path / "relp_spool2")
    with ListenRELP(spool, ack_policy="accept", segment_rows=100) as srv:
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=10)
        f = s.makefile("rb")
        s.sendall(_relp_frame(1, "open", b"commands=syslog"))
        _read_relp_rsp(f)
        s.sendall(_relp_frame(2, "syslog", b"hello"))
        assert _read_relp_rsp(f)[0] == 2
        assert srv.writer.rows_buffered == 1  # acked from buffer, not sealed

        # malformed: non-numeric datalen → connection dropped, no ack
        s2 = socket.create_connection(("127.0.0.1", srv.port), timeout=10)
        s2.sendall(b"notanumber open x" + b"y" * 300)
        assert s2.makefile("rb").read(1) == b""  # server closed it
        s2.close()
        s.close()


def test_http_put_push_egress(tmp_path, ray_session):
    """PostHTTP analog: 2xx acks, 5xx retried with the SAME idempotency
    key until success, 4xx fails fast, dead endpoint exhausts retries —
    all routed to columns, never raised."""
    import http.server
    import socketserver
    from collections import defaultdict

    import ray.data

    from nifi_ray.stages.http import HttpPut

    seen = defaultdict(list)  # path -> list of idempotency keys
    flaky_fails = {"n": 0}

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            self.rfile.read(n)
            seen[self.path].append(self.headers.get("X-Idempotency-Key"))
            if self.path == "/bad":
                self.send_response(400)
            elif self.path == "/flaky" and flaky_fails["n"] < 2:
                flaky_fails["n"] += 1
                self.send_response(503)
            else:
                self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    class Srv(socketserver.ThreadingMixIn, http.server.HTTPServer):
        daemon_threads = True

    srv = Srv(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        rows = [
            {"url": f"http://127.0.0.1:{port}/ok", "content": b"payload-ok"},
            {"url": f"http://127.0.0.1:{port}/flaky", "content": b"payload-flaky"},
            {"url": f"http://127.0.0.1:{port}/bad", "content": b"payload-bad"},
            {"url": "http://127.0.0.1:1/dead", "content": b"payload-dead"},
        ]
        # concurrency=1 so the flaky endpoint's failure counter is hit by
        # one deterministic actor sequence
        out = {
            r["url"].rsplit("/", 1)[1]: r
            for r in ray.data.from_items(rows)
            .map_batches(
                HttpPut(url_col="url", max_retries=3, backoff_s=0.01),
                batch_format="pyarrow",
                concurrency=1,
                batch_size=4,
            )
            .take_all()
        }
        assert out["ok"]["status_code"] == 200 and out["ok"]["attempts"] == 1
        assert out["ok"]["error"] is None
        # 503, 503, 200 → three attempts, same idempotency key each time
        assert out["flaky"]["status_code"] == 200 and out["flaky"]["attempts"] == 3
        assert len(set(seen["/flaky"])) == 1 and len(seen["/flaky"]) == 3
        # 4xx: fail fast, exactly one attempt
        assert out["bad"]["status_code"] == 400 and out["bad"]["attempts"] == 1
        assert out["bad"]["error"] == "HTTP 400"
        # dead endpoint: transport error, retries exhausted
        assert out["dead"]["status_code"] == -1 and out["dead"]["attempts"] == 4
        assert out["dead"]["error"]
    finally:
        srv.shutdown()
        srv.server_close()


def test_lumberjack_data_and_compressed_frames(tmp_path, ray_session):
    import json
    import struct
    import zlib

    from nifi_ray.sources.listen import ListenLumberjack

    def d_frame(seq, fields):
        body = struct.pack(">II", seq, len(fields))
        for k, v in fields.items():
            kb, vb = k.encode(), v.encode()
            body += struct.pack(">I", len(kb)) + kb + struct.pack(">I", len(vb)) + vb
        return b"1D" + body

    spool = str(tmp_path / "spool")
    with ListenLumberjack(spool) as srv:
        c = socket.create_connection(("127.0.0.1", srv.port))
        c.sendall(b"1W" + struct.pack(">I", 3))
        c.sendall(d_frame(1, {"line": "hello one", "host": "beat1"}))
        c.sendall(d_frame(2, {"line": "hello two", "host": "beat1"}))
        # compressed frame embedding two data frames (the reference's
        # processDECOMPRESSED iteration)
        inner = d_frame(3, {"line": "zipped three"})[0:] + d_frame(4, {"k": "v4"})
        blob = zlib.compress(inner)
        c.sendall(b"1C" + struct.pack(">I", len(blob)) + blob)
        # collect acks: one 1A+seq per accepted record, in order
        acks = b""
        while len(acks) < 4 * 6:
            chunk = c.recv(4096)
            assert chunk, "server closed before acking"
            acks += chunk
        got_seqs = [
            struct.unpack(">I", acks[i + 2 : i + 6])[0]
            for i in range(0, len(acks), 6)
        ]
        assert got_seqs == [1, 2, 3, 4]
        assert acks[0:2] == b"1A"
        c.close()
        _wait_rows(srv.writer, 4)
    rows = spool_dataset(spool).take_all()
    by_seq = {r["seq"]: r for r in rows}
    assert by_seq[1]["payload"] == "hello one"
    assert json.loads(by_seq[1]["fields_json"]) == {"line": "hello one", "host": "beat1"}
    assert by_seq[3]["payload"] == "zipped three"
    # no 'line' key: payload falls back to the field map as JSON
    assert json.loads(by_seq[4]["payload"]) == {"k": "v4"}
    assert all(r["proto"] == "lumberjack" for r in rows)


def test_lumberjack_malformed_frame_drops_connection_unacked(tmp_path):
    import struct

    from nifi_ray.sources.listen import ListenLumberjack

    spool = str(tmp_path / "spool")
    with ListenLumberjack(spool) as srv:
        c = socket.create_connection(("127.0.0.1", srv.port))
        c.sendall(b"9X" + struct.pack(">I", 0))  # bad version/type
        c.settimeout(5)
        assert c.recv(1024) == b""  # closed without ack → client retransmits
        c.close()
        assert srv.writer.rows_written + srv.writer.rows_buffered == 0


# ----------------------------------------------------------- AMQP 0-9-1


class _AmqpClient:
    """Minimal AMQP 0-9-1 publisher for loopback tests (frames per the
    public spec §2.3; no client libs in this sandbox)."""

    def __init__(self, port):
        import struct

        self.struct = struct
        self.s = socket.create_connection(("127.0.0.1", port), timeout=10)
        self.f = self.s.makefile("rwb")

    def frame(self, ftype, channel, payload):
        st = self.struct
        self.f.write(st.pack(">BHI", ftype, channel, len(payload)) + payload + b"\xce")
        self.f.flush()

    def method(self, channel, cls, meth, args=b""):
        self.frame(1, channel, self.struct.pack(">HH", cls, meth) + args)

    def read_frame(self):
        st = self.struct
        h = self.f.read(7)
        ftype, channel, size = st.unpack(">BHI", h)
        payload = self.f.read(size)
        assert self.f.read(1) == b"\xce"
        return ftype, channel, payload

    def expect_method(self, cls, meth):
        ftype, _ch, payload = self.read_frame()
        assert ftype == 1
        got = self.struct.unpack(">HH", payload[:4])
        assert got == (cls, meth), f"expected {(cls, meth)}, got {got}"
        return payload[4:]

    def handshake(self):
        st = self.struct
        self.s.sendall(b"AMQP\x00\x00\x09\x01")
        self.expect_method(10, 10)  # Connection.Start
        # StartOk: client-props(table) mechanism(shortstr) response(longstr) locale(shortstr)
        args = st.pack(">I", 0) + b"\x05PLAIN" + st.pack(">I", 0) + b"\x05en_US"
        self.method(0, 10, 11, args)
        self.expect_method(10, 30)  # Tune
        self.method(0, 10, 31, st.pack(">HIH", 0, 131072, 0))  # TuneOk
        self.method(0, 10, 40, b"\x01/\x00\x00")  # Open vhost "/"
        self.expect_method(10, 41)
        self.method(1, 20, 10, b"\x00")  # Channel.Open
        self.expect_method(20, 11)

    def publish(self, routing_key: bytes, body: bytes, split=False):
        st = self.struct
        args = st.pack(">H", 0) + b"\x00" + bytes([len(routing_key)]) + routing_key + b"\x00"
        self.method(1, 60, 40, args)
        hdr = st.pack(">HHQH", 60, 0, len(body), 0)  # no properties
        self.frame(2, 1, hdr)
        if split and len(body) > 1:
            mid = len(body) // 2
            self.frame(3, 1, body[:mid])
            self.frame(3, 1, body[mid:])
        else:
            self.frame(3, 1, body)

    def close(self):
        self.method(0, 10, 50, self.struct.pack(">H", 200) + b"\x00" + b"\x00\x00\x00\x00")
        self.expect_method(10, 51)
        self.s.close()


def test_amqp_publish_with_confirms(tmp_path, ray_session):
    from nifi_ray.sources.listen import ListenAMQP

    spool = str(tmp_path / "amqp")
    with ListenAMQP(spool_dir=spool) as srv:
        c = _AmqpClient(srv.port)
        c.handshake()
        c.method(1, 85, 10, b"\x00")  # Confirm.Select
        c.expect_method(85, 11)
        c.publish(b"orders", b"hello amqp")
        args = c.expect_method(60, 80)  # Basic.Ack
        (tag1,) = c.struct.unpack(">Q", args[:8])
        c.publish(b"orders", b"split body message", split=True)
        args = c.expect_method(60, 80)
        (tag2,) = c.struct.unpack(">Q", args[:8])
        assert (tag1, tag2) == (1, 2)
        # ack arrived AFTER the durable accept: both rows already spooled
        assert srv.writer.rows_written + srv.writer.rows_buffered == 2
        c.close()
    rows = sorted(spool_dataset(spool).take_all(), key=lambda r: r["offset"])
    assert [r["payload"] for r in rows] == ["hello amqp", "split body message"]
    assert {r["routing_key"] for r in rows} == {"orders"}
    assert all(r["confirmed"] and r["proto"] == "amqp" for r in rows)


def test_amqp_unconfirmed_publish_and_heartbeat(tmp_path, ray_session):
    from nifi_ray.sources.listen import ListenAMQP

    spool = str(tmp_path / "amqp2")
    with ListenAMQP(spool_dir=spool) as srv:
        c = _AmqpClient(srv.port)
        c.handshake()
        c.frame(8, 0, b"")  # heartbeat → echoed
        ftype, _, _ = c.read_frame()
        assert ftype == 8
        c.publish(b"logs", b"fire and forget")  # no confirm.select → no ack
        c.close()  # CloseOk only arrives after the publish is processed
        assert srv.writer.rows_written + srv.writer.rows_buffered == 1
    rows = spool_dataset(spool).take_all()
    assert rows[0]["payload"] == "fire and forget"
    assert rows[0]["confirmed"] is False


def test_amqp_unsupported_method_closes_loudly(tmp_path):
    from nifi_ray.sources.listen import ListenAMQP

    spool = str(tmp_path / "amqp3")
    with ListenAMQP(spool_dir=spool) as srv:
        c = _AmqpClient(srv.port)
        c.handshake()
        c.method(1, 60, 20, b"\x00\x00")  # Basic.Consume: unsupported
        args = c.expect_method(10, 50)  # Connection.Close 540
        (code,) = c.struct.unpack(">H", args[:2])
        assert code == 540
        c.s.close()


def test_amqp_bad_protocol_header_rejected(tmp_path):
    from nifi_ray.sources.listen import ListenAMQP

    spool = str(tmp_path / "amqp4")
    with ListenAMQP(spool_dir=spool) as srv:
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
        s.sendall(b"HTTP/1.1 GET /")
        got = s.recv(16)
        assert got == b"AMQP\x00\x00\x09\x01"  # supported header, then close
        assert s.recv(16) == b""
        s.close()


def test_amqp_oversized_body_frame_drops_connection(tmp_path):
    # body exceeding the declared content-header size is a corrupt
    # frame sequence: drop the connection UNACKED, never spool+confirm
    from nifi_ray.sources.listen import ListenAMQP

    spool = str(tmp_path / "amqp5")
    with ListenAMQP(spool_dir=spool) as srv:
        c = _AmqpClient(srv.port)
        c.handshake()
        c.method(1, 85, 10, b"\x00")  # Confirm.Select
        c.expect_method(85, 11)
        rk = b"orders"
        args = c.struct.pack(">H", 0) + b"\x00" + bytes([len(rk)]) + rk + b"\x00"
        c.method(1, 60, 40, args)  # Basic.Publish
        c.frame(2, 1, c.struct.pack(">HHQH", 60, 0, 5, 0))  # declares 5 bytes
        c.frame(3, 1, b"eightbyt")  # sends 8 → must be dropped
        assert c.s.recv(16) == b""  # server closed, no Basic.Ack
        c.s.close()
        assert srv.writer.rows_written + srv.writer.rows_buffered == 0


# ---- STOMP ----------------------------------------------------------


def _stomp_read_frame(f):
    buf = bytearray()
    while not buf.endswith(b"\x00"):
        c = f.read(1)
        assert c, "connection closed"
        buf += c
    head, _, body = bytes(buf[:-1]).partition(b"\n\n")
    lines = head.split(b"\n")
    hdrs = dict(
        ln.partition(b":")[::2] for ln in lines[1:] if ln
    )
    return lines[0].decode(), {k.decode(): v.decode() for k, v in hdrs.items()}, body


def test_stomp_send_receipt_after_durable_spool(tmp_path, ray_session):
    from nifi_ray.sources.listen import ListenSTOMP

    spool = str(tmp_path / "stomp")
    with ListenSTOMP(spool_dir=spool) as srv:
        s = socket.create_connection(("127.0.0.1", srv.port))
        f = s.makefile("rb")
        s.sendall(b"CONNECT\naccept-version:1.2\nhost:x\n\n\x00")
        cmd, hdrs, _ = _stomp_read_frame(f)
        assert cmd == "CONNECTED" and hdrs["version"] == "1.2"
        # pipeline three SENDs with receipts; receipts must arrive
        # AFTER the durable flush (rows_written covers all three)
        for i in range(3):
            s.sendall(
                f"SEND\ndestination:/queue/a\nreceipt:m{i}\n\nhello {i}\x00".encode()
            )
        rids = sorted(_stomp_read_frame(f)[1]["receipt-id"] for _ in range(3))
        assert rids == ["m0", "m1", "m2"]
        assert srv.writer.rows_written == 3  # sealed before the acks
        s.sendall(b"DISCONNECT\nreceipt:bye\n\n\x00")
        assert _stomp_read_frame(f)[1]["receipt-id"] == "bye"
        s.close()
    rows = sorted(spool_dataset(spool).take_all(), key=lambda r: r["offset"])
    assert [r["payload"] for r in rows] == ["hello 0", "hello 1", "hello 2"]
    assert all(
        r["confirmed"] and r["proto"] == "stomp" and r["destination"] == "/queue/a"
        for r in rows
    )


def test_stomp_content_length_nul_body_and_escapes(tmp_path, ray_session):
    from nifi_ray.sources.listen import ListenSTOMP

    spool = str(tmp_path / "stomp2")
    with ListenSTOMP(spool_dir=spool) as srv:
        s = socket.create_connection(("127.0.0.1", srv.port))
        f = s.makefile("rb")
        # heart-beat EOLs + CRLF framing on CONNECT
        s.sendall(b"\n\r\nCONNECT\r\naccept-version:1.2\r\n\r\n\x00")
        assert _stomp_read_frame(f)[0] == "CONNECTED"
        # NUL inside a content-length-bounded body; \c escape in header
        s.sendall(b"SEND\ndestination:/queue/q\\c2\ncontent-length:3\n\na\x00b\x00")
        s.sendall(b"DISCONNECT\nreceipt:d\n\n\x00")
        assert _stomp_read_frame(f)[1]["receipt-id"] == "d"
        s.close()
    rows = spool_dataset(spool).take_all()
    assert rows[0]["payload"] == "a\x00b"
    assert rows[0]["destination"] == "/queue/q:2"
    assert rows[0]["confirmed"] is False


def test_stomp_unsupported_command_errors_loudly(tmp_path):
    from nifi_ray.sources.listen import ListenSTOMP

    spool = str(tmp_path / "stomp3")
    with ListenSTOMP(spool_dir=spool) as srv:
        s = socket.create_connection(("127.0.0.1", srv.port))
        f = s.makefile("rb")
        s.sendall(b"CONNECT\n\n\x00")
        assert _stomp_read_frame(f)[0] == "CONNECTED"
        s.sendall(b"SUBSCRIBE\nid:0\ndestination:/queue/a\n\n\x00")
        cmd, hdrs, _ = _stomp_read_frame(f)
        assert cmd == "ERROR" and "not implemented" in hdrs["message"]
        assert s.recv(16) == b""  # server closed after ERROR
        s.close()
        assert srv.writer.rows_written + srv.writer.rows_buffered == 0


def test_stomp_put_roundtrip_and_reconnect(tmp_path, ray_session):
    from nifi_ray.sources.listen import ListenSTOMP
    from nifi_ray.stages.egress import StompPut

    spool = str(tmp_path / "stomp4")
    with ListenSTOMP(spool_dir=spool) as srv:
        put = StompPut("127.0.0.1", srv.port, destination="/queue/ev")
        t = pa.table({"content": pa.array(["x", None, "ümläut:z"], pa.string())})
        out = put(t)
        assert out["sent"].to_pylist() == [True, False, True]
        assert out["error"].to_pylist()[1] == "null content"
        # sever the broker side: next batch must reconnect-once and succeed
        put._conn[0].close()
        out2 = put(pa.table({"content": pa.array(["after"], pa.string())}))
        assert out2["sent"].to_pylist() == [True]
        srv.writer.flush()
    rows = sorted(spool_dataset(spool).take_all(), key=lambda r: r["offset"])
    assert [r["payload"] for r in rows] == ["x", "ümläut:z", "after"]
    assert all(r["confirmed"] for r in rows)
