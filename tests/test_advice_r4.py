"""Round-4 advice regressions (nifi_ray-specific edge-processor fixes):

1. ExecuteStreamCommand argv templating honors the never-raise
   contract — a missing column / stray '{' routes to
   execution_status = -1 instead of killing the block retry.
2. HttpContextServer filters framing / hop-by-hop headers out of
   user-supplied response header maps (no duplicate Content-Length),
   and respond() completes exchanges under the lock so its
   'completed' count can't race the 503 expiration path.
3. TcpPut never resends after a PARTIAL write (a resend would append
   a full copy behind the fragment — a truncated extra record under
   newline framing); zero-byte stale-pool failures still retry once.
4. ListenLumberjack rejects v2 'J' frames inside compressed blocks,
   matching the uncompressed path (the v1 D-frame grammar would
   misread a JSON payload length as a pair count).
"""

import threading
import time

import pyarrow as pa

from nifi_ray.stages.exec import ExecuteStreamCommand


def test_exec_template_missing_column_never_raises():
    t = pa.table({"content": ["x", "y"], "arg": ["a", "b"]})
    st = ExecuteStreamCommand(argv=["echo", "{nope}"], ignore_stdin=True)
    out = st(t)
    assert out["execution_status"].to_pylist() == [-1, -1]
    assert all("template error" in e for e in out["execution_error"].to_pylist())


def test_exec_template_bad_format_spec_never_raises():
    t = pa.table({"content": ["x"]})
    st = ExecuteStreamCommand(argv=["echo", "{"], ignore_stdin=True)
    out = st(t)
    assert out["execution_status"].to_pylist() == [-1]


def test_exec_template_valid_column_still_works():
    t = pa.table({"content": ["ignored"], "word": ["hello"]})
    st = ExecuteStreamCommand(argv=["echo", "-n", "{word}"], ignore_stdin=True)
    out = st(t)
    assert out["execution_status"].to_pylist() == [0]
    assert out["cmd_output"].to_pylist() == [b"hello"]


def test_webservice_filters_framing_headers():
    import http.client
    import json

    from nifi_ray.sources.webservice import HttpContextServer

    with HttpContextServer(request_expiration_s=10.0) as srv:
        result = {}

        def client():
            c = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=10)
            c.request("GET", "/x")
            r = c.getresponse()
            result["headers"] = r.getheaders()
            result["body"] = r.read()
            c.close()

        th = threading.Thread(target=client)
        th.start()
        reqs = srv.pending(min_rows=1, timeout=5.0)
        hdrs = json.dumps(
            {"Content-Length": "99999", "Transfer-Encoding": "chunked", "X-Ok": "1"}
        )
        resp = pa.table(
            {
                "http_context_id": reqs["http_context_id"],
                "status_code": pa.array([200] * reqs.num_rows, pa.int32()),
                "response_body": pa.array(["hi"] * reqs.num_rows),
                "headers": pa.array([hdrs] * reqs.num_rows),
            }
        )
        st = srv.respond(resp, headers_col="headers")
        th.join(timeout=10)
        assert st == {"completed": 1, "missing": 0}
        cl = [v for k, v in result["headers"] if k.lower() == "content-length"]
        te = [v for k, v in result["headers"] if k.lower() == "transfer-encoding"]
        xok = [v for k, v in result["headers"] if k.lower() == "x-ok"]
        assert cl == ["2"] and te == [] and xok == ["1"]
        assert result["body"] == b"hi"


def test_webservice_expired_respond_counts_missing():
    from nifi_ray.sources.webservice import HttpContextServer

    with HttpContextServer(request_expiration_s=0.2) as srv:
        codes = {}

        def client():
            import http.client

            c = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=10)
            c.request("GET", "/x")
            codes["status"] = c.getresponse().status
            c.close()

        th = threading.Thread(target=client)
        th.start()
        reqs = srv.pending(min_rows=1, timeout=5.0)
        th.join(timeout=10)  # let it expire (503) before responding
        time.sleep(0.05)
        resp = pa.table(
            {
                "http_context_id": reqs["http_context_id"],
                "status_code": pa.array([200] * reqs.num_rows, pa.int32()),
                "response_body": pa.array(["late"] * reqs.num_rows),
            }
        )
        st = srv.respond(resp)
        assert codes["status"] == 503
        # the expired exchange was popped under the lock → counted
        # missing, never 'completed' while the client saw 503
        assert st == {"completed": 0, "missing": 1}


class _FlakySock:
    """send() writes some bytes then dies — a mid-stream failure."""

    def __init__(self, accept_bytes: int):
        self.accept = accept_bytes
        self.sent = b""

    def send(self, view) -> int:
        if self.accept <= 0:
            raise OSError("peer reset")
        n = min(self.accept, len(view))
        self.sent += bytes(view[:n])
        self.accept -= n
        if self.accept == 0:
            self.accept = -1  # next call fails
        return n

    def close(self):
        pass


def test_tcpput_partial_write_not_retried(monkeypatch):
    from nifi_ray.stages.egress import TcpPut

    put = TcpPut("127.0.0.1", 1)  # never actually connects
    flaky = _FlakySock(accept_bytes=3)
    reconnects = []
    monkeypatch.setattr(put, "_connect", lambda: reconnects.append(1) or _FlakySock(0))
    put._sock = flaky
    err = put._send(b"hello-world")
    assert err is not None and "partial frame" in err
    # no reconnect happened: a partial write must NOT be resent
    assert reconnects == []


def test_tcpput_stale_pool_zero_byte_failure_retries(monkeypatch):
    from nifi_ray.stages.egress import TcpPut

    put = TcpPut("127.0.0.1", 1)
    fresh = _FlakySock(accept_bytes=10**6)
    monkeypatch.setattr(put, "_connect", lambda: fresh)
    put._sock = _FlakySock(accept_bytes=0)  # stale: dies before any byte
    err = put._send(b"payload")
    assert err is None
    assert fresh.sent == b"payload\n"


def test_lumberjack_compressed_rejects_v2_json_frames():
    import socket
    import struct
    import zlib

    from nifi_ray.sources.listen import ListenLumberjack, spool_dataset
    import tempfile

    spool = tempfile.mkdtemp(prefix="lj_adv_")
    with ListenLumberjack(port=0, spool_dir=spool) as srv:
        port = srv.port
        # compressed block holding a v2 J frame: must be rejected whole
        j_payload = b'{"seq": 1, "line": "x"}'
        inner = b"2J" + struct.pack(">I", 1) + struct.pack(">I", len(j_payload)) + j_payload
        blob = zlib.compress(inner)
        frame = b"1W" + struct.pack(">I", 1) + b"1C" + struct.pack(">I", len(blob)) + blob
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        s.sendall(frame)
        s.settimeout(1.0)
        try:
            got = s.recv(64)  # server drops the connection without ACK
        except (TimeoutError, OSError):
            got = b""
        s.close()
        assert got == b""
