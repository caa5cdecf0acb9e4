"""Push-protocol ingest edges — ListenTCP / ListenUDP / ListenSyslog /
ListenHTTP analogs (reference nifi-standard-processors/src/main/java/
org/apache/nifi/processors/standard/ListenTCP.java, ListenUDP.java,
ListenSyslog.java, ListenHTTP.java).

A push edge cannot be a Dataset transform — records arrive on the
sender's schedule, not the reader's. Every listener here is a thin
protocol framer in front of ONE durable spool: the same partitioned
offset-keyed segment layout the SegmentConsumer reads
(sources/segments.py), so pushed records flow through the identical
consume → process machinery as any broker topic, with commit-after-
session offsets and at-least-once delivery. The reference's internal
flowfile queue between a Listen* processor and the rest of the graph
plays the same role; here the queue is spelled as parquet segments, so
it is durable, partitioned, and distributed-readable by construction.

Scale notes: one listener instance is one ingest NODE (the reference
runs a Listen* processor per node behind a load balancer — the admin
guide's recommended HA pattern). Run N listeners writing N disjoint
spool partitions (``partition=`` arg); downstream reads scale as
segment-count × size math, not a listener redesign. The write path is
append-buffer + atomic segment rotation; readers only ever see sealed
segments, so a crashed listener loses at most its unflushed buffer —
the same bound as the reference's max-batch-size socket buffer.
"""

from __future__ import annotations

import glob
import http.server
import os
import socketserver
import threading

import pyarrow as pa
import pyarrow.parquet as pq


class SpoolWriter:
    """Durable append spool: buffered records → offset-keyed parquet
    segment files under ``spool_dir/partition=P/``, rotated every
    ``segment_rows`` and sealed atomically (tmp + rename — the same
    PutFile contract as the lake's part writes). Thread-safe; every
    protocol handler thread appends through one writer. Offsets are
    dense per partition and resume from existing segments, so a
    restarted listener continues the stream instead of forking it."""

    def __init__(self, spool_dir: str, partition: int = 0, segment_rows: int = 4096):
        self.dir = os.path.join(spool_dir, f"partition={partition}")
        os.makedirs(self.dir, exist_ok=True)
        self.segment_rows = segment_rows
        self._lock = threading.Lock()
        self._buf: list[dict] = []
        self._next_offset = 0
        self._next_seg = 0
        for f in sorted(glob.glob(os.path.join(self.dir, "segment-*.parquet"))):
            md = pq.read_metadata(f)
            self._next_offset += md.num_rows
            self._next_seg += 1

    def append(self, record: dict) -> None:
        with self._lock:
            self._buf.append(record)
            if len(self._buf) >= self.segment_rows:
                self._flush_locked()

    def flush(self) -> None:
        with self._lock:
            self._flush_locked()

    def _flush_locked(self) -> None:
        if not self._buf:
            return
        t = pa.Table.from_pylist(self._buf)
        t = t.append_column(
            "offset",
            pa.array(range(self._next_offset, self._next_offset + t.num_rows), pa.int64()),
        )
        path = os.path.join(self.dir, f"segment-{self._next_seg:05d}.parquet")
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        self._next_offset += t.num_rows
        self._next_seg += 1
        self._buf = []

    @property
    def rows_written(self) -> int:
        with self._lock:
            return self._next_offset

    @property
    def rows_buffered(self) -> int:
        with self._lock:
            return len(self._buf)


class _Listener:
    """Common lifecycle: serve on a daemon thread, flush-on-close."""

    server: socketserver.BaseServer
    writer: SpoolWriter

    def _start(self) -> None:
        self._thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self._thread.start()

    @property
    def port(self) -> int:
        return self.server.server_address[1]

    def close(self) -> None:
        self.server.shutdown()
        self.server.server_close()
        self._thread.join()
        self.writer.flush()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class ListenTCP(_Listener):
    """Newline-framed TCP listener (ListenTCP.java): each line is one
    record ``{payload, sender, proto}`` — the reference's flowfile
    content + ``tcp.sender`` attribute. Many concurrent connections;
    per-connection order is preserved by the single spool lock (the
    reference's max-concurrent-connections + event queue)."""

    def __init__(
        self,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        partition: int = 0,
        segment_rows: int = 4096,
        max_line: int = 1 << 20,
    ):
        self.writer = SpoolWriter(spool_dir, partition, segment_rows)
        writer, proto = self.writer, "tcp"

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                sender = self.client_address[0]
                while True:
                    line = self.rfile.readline(max_line)
                    if not line:
                        return
                    writer.append(
                        {
                            "payload": line.rstrip(b"\r\n").decode("utf-8", "replace"),
                            "sender": sender,
                            "proto": proto,
                        }
                    )

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self.server = Server((host, port), Handler)
        self._start()


class ListenUDP(_Listener):
    """Datagram listener (ListenUDP.java): one datagram = one record.
    Loopback/test transport — a production deployment fronts this with
    the same load-balancer pattern as the reference."""

    def __init__(
        self,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        partition: int = 0,
        segment_rows: int = 4096,
    ):
        self.writer = SpoolWriter(spool_dir, partition, segment_rows)
        writer = self.writer

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                data, _sock = self.request
                writer.append(
                    {
                        "payload": data.decode("utf-8", "replace"),
                        "sender": self.client_address[0],
                        "proto": "udp",
                    }
                )

        class Server(socketserver.ThreadingUDPServer):
            allow_reuse_address = True
            daemon_threads = True

        self.server = Server((host, port), Handler)
        self._start()


def ListenSyslog(spool_dir: str, proto: str = "tcp", **kw):
    """ListenSyslog.java in parse-free mode: spool raw syslog lines
    (TCP newline-framed or one datagram per message); parsing into
    severity/facility/host columns is the downstream ``ParseSyslog``
    actor-pool stage (stages/parsers.py) — separating the I/O edge from
    the parse keeps the parse distributed and re-runnable, where the
    reference parses on the ingest node."""
    cls = ListenTCP if proto == "tcp" else ListenUDP
    return cls(spool_dir, **kw)


class ListenHTTP(_Listener):
    """HTTP POST listener (ListenHTTP.java): each POST body is one
    record with ``{payload, path, sender, content_type}`` — the
    reference's flowfile + http.* attributes. Responds 200 after the
    record is accepted into the spool buffer (the reference ACKs after
    the session transfer; durability to a sealed segment is the
    commit-after-session boundary downstream consumers see)."""

    def __init__(
        self,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        partition: int = 0,
        segment_rows: int = 4096,
    ):
        self.writer = SpoolWriter(spool_dir, partition, segment_rows)
        writer = self.writer

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                writer.append(
                    {
                        "payload": body.decode("utf-8", "replace"),
                        "path": self.path,
                        "sender": self.client_address[0],
                        "content_type": self.headers.get("Content-Type", ""),
                    }
                )
                self.send_response(200)
                self.end_headers()

            def log_message(self, *a):  # no stderr chatter per request
                pass

        class Server(socketserver.ThreadingMixIn, http.server.HTTPServer):
            allow_reuse_address = True
            daemon_threads = True

        self.server = Server((host, port), Handler)
        self._start()


class ListenWebSocket(_Listener):
    """WebSocket listener (nifi-websocket-bundle ListenWebSocket.java /
    JettyWebSocketServer.java): RFC 6455 server side — HTTP Upgrade
    handshake (Sec-WebSocket-Accept), client-masked frame decode with
    continuation reassembly, ping→pong, close handshake — spooling one
    record per complete text/binary message:
    ``{payload, opcode, path, sender, proto}``. The Jetty machinery is
    replaced by ~60 lines of stdlib framing; everything downstream is
    the same durable spool every other listener feeds."""

    _GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

    def __init__(
        self,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        partition: int = 0,
        segment_rows: int = 4096,
        max_message_bytes: int = 16 << 20,
    ):
        import base64
        import hashlib
        import struct

        self.writer = SpoolWriter(spool_dir, partition, segment_rows)
        writer, guid = self.writer, self._GUID

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                # --- HTTP Upgrade handshake
                request = self.rfile.readline().decode("latin-1").strip()
                parts = request.split(" ")
                path = parts[1] if len(parts) > 1 else "/"
                headers = {}
                while True:
                    line = self.rfile.readline().decode("latin-1").strip()
                    if not line:
                        break
                    k, _, v = line.partition(":")
                    headers[k.strip().lower()] = v.strip()
                key = headers.get("sec-websocket-key")
                if headers.get("upgrade", "").lower() != "websocket" or not key:
                    self.wfile.write(b"HTTP/1.1 400 Bad Request\r\n\r\n")
                    return
                accept = base64.b64encode(
                    hashlib.sha1((key + guid).encode()).digest()
                ).decode()
                self.wfile.write(
                    (
                        "HTTP/1.1 101 Switching Protocols\r\n"
                        "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                        f"Sec-WebSocket-Accept: {accept}\r\n\r\n"
                    ).encode()
                )
                # --- frame loop
                frags: list[bytes] = []
                frag_op = 1
                while True:
                    hdr = self.rfile.read(2)
                    if len(hdr) < 2:
                        return
                    fin = bool(hdr[0] & 0x80)
                    op = hdr[0] & 0x0F
                    masked = bool(hdr[1] & 0x80)
                    ln = hdr[1] & 0x7F
                    if ln == 126:
                        (ln,) = struct.unpack(">H", self.rfile.read(2))
                    elif ln == 127:
                        (ln,) = struct.unpack(">Q", self.rfile.read(8))
                    if ln > max_message_bytes:
                        return  # protocol violation: drop connection
                    mask = self.rfile.read(4) if masked else b""
                    data = self.rfile.read(ln)
                    if masked:
                        data = bytes(b ^ mask[i % 4] for i, b in enumerate(data))
                    if op == 0x8:  # close: echo + stop
                        self.wfile.write(b"\x88\x00")
                        return
                    if op == 0x9:  # ping → pong with same payload
                        self.wfile.write(bytes([0x8A, len(data)]) + data)
                        continue
                    if op in (0x1, 0x2):
                        frag_op = op
                        frags = [data]
                    elif op == 0x0:  # continuation
                        frags.append(data)
                    else:
                        continue
                    if fin:
                        whole = b"".join(frags)
                        writer.append(
                            {
                                "payload": whole.decode("utf-8", "replace")
                                if frag_op == 0x1
                                else whole.hex(),
                                "opcode": "text" if frag_op == 0x1 else "binary",
                                "path": path,
                                "sender": self.client_address[0],
                                "proto": "ws",
                            }
                        )
                        frags = []

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self.server = Server((host, port), Handler)
        self._start()


class ListenMQTT(_Listener):
    """MQTT ingest edge (nifi-mqtt-bundle ConsumeMQTT.java consumes
    from an external broker; this sandbox has none, so the engine IS
    the broker edge): an MQTT 3.1.1 server subset — CONNECT→CONNACK,
    PUBLISH QoS0 (spool) and QoS1 (spool then PUBACK — ack-after-
    accept, the commit-after-session ordering), SUBSCRIBE→SUBACK
    (accepted; no outbound push), PINGREQ→PINGRESP, DISCONNECT —
    spooling ``{payload, topic, qos, sender, proto}`` per PUBLISH."""

    def __init__(
        self,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        partition: int = 0,
        segment_rows: int = 4096,
        max_message_bytes: int = 16 << 20,
    ):
        self.writer = SpoolWriter(spool_dir, partition, segment_rows)
        writer = self.writer

        class Handler(socketserver.StreamRequestHandler):
            def _varint(self):
                mult, val = 1, 0
                for _ in range(4):
                    b = self.rfile.read(1)
                    if not b:
                        raise EOFError
                    val += (b[0] & 0x7F) * mult
                    if not b[0] & 0x80:
                        return val
                    mult *= 128
                raise ValueError("malformed remaining-length")

            def handle(self):
                try:
                    while True:
                        h = self.rfile.read(1)
                        if not h:
                            return
                        ptype, flags = h[0] >> 4, h[0] & 0x0F
                        ln = self._varint()
                        if ln > max_message_bytes:
                            return
                        body = self.rfile.read(ln)
                        if ptype == 1:  # CONNECT → CONNACK accepted
                            self.wfile.write(b"\x20\x02\x00\x00")
                        elif ptype == 3:  # PUBLISH
                            tlen = int.from_bytes(body[0:2], "big")
                            topic = body[2 : 2 + tlen].decode("utf-8", "replace")
                            p = 2 + tlen
                            qos = (flags >> 1) & 0x3
                            pid = None
                            if qos > 0:
                                pid = int.from_bytes(body[p : p + 2], "big")
                                p += 2
                            writer.append(
                                {
                                    "payload": body[p:].decode("utf-8", "replace"),
                                    "topic": topic,
                                    "qos": qos,
                                    "sender": self.client_address[0],
                                    "proto": "mqtt",
                                }
                            )
                            if qos == 1:  # ack AFTER the spool accept
                                self.wfile.write(
                                    b"\x40\x02" + pid.to_bytes(2, "big")
                                )
                        elif ptype == 8:  # SUBSCRIBE → SUBACK (QoS0 grants)
                            pid = body[0:2]
                            n_topics = 0
                            p = 2
                            while p < len(body):
                                tl = int.from_bytes(body[p : p + 2], "big")
                                p += 2 + tl + 1
                                n_topics += 1
                            self.wfile.write(
                                bytes([0x90, 2 + n_topics]) + pid + b"\x00" * n_topics
                            )
                        elif ptype == 12:  # PINGREQ → PINGRESP
                            self.wfile.write(b"\xd0\x00")
                        elif ptype == 14:  # DISCONNECT
                            return
                except (EOFError, ValueError, ConnectionError):
                    return

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self.server = Server((host, port), Handler)
        self._start()


class ListenSMTP(_Listener):
    """SMTP listener (nifi-email-bundle ListenSMTP.java): a minimal
    RFC 5321 receiver — HELO/EHLO, MAIL FROM, RCPT TO, DATA with
    dot-unstuffing, RSET, QUIT — spooling one record per accepted
    message: ``{payload (raw RFC-822 text), mail_from, rcpt_to,
    sender, proto}``. Parsing headers/attachments stays the
    downstream distributed ``ParseEmail`` stage (stages/parsers.py),
    same edge/parse split as ListenSyslog."""

    def __init__(
        self,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        partition: int = 0,
        segment_rows: int = 4096,
        max_message_bytes: int = 16 << 20,
    ):
        self.writer = SpoolWriter(spool_dir, partition, segment_rows)
        writer = self.writer

        class Handler(socketserver.StreamRequestHandler):
            def _say(self, line: str):
                self.wfile.write((line + "\r\n").encode())

            def handle(self):
                self._say("220 nifi_ray ESMTP")
                mail_from, rcpts = None, []
                while True:
                    raw = self.rfile.readline(4096)
                    if not raw:
                        return
                    line = raw.decode("utf-8", "replace").strip()
                    verb = line.split(" ", 1)[0].upper() if line else ""
                    if verb in ("HELO", "EHLO"):
                        self._say("250 ok")
                    elif verb == "MAIL":
                        mail_from = line.partition(":")[2].strip().strip("<>")
                        self._say("250 ok")
                    elif verb == "RCPT":
                        rcpts.append(line.partition(":")[2].strip().strip("<>"))
                        self._say("250 ok")
                    elif verb == "RSET":
                        mail_from, rcpts = None, []
                        self._say("250 ok")
                    elif verb == "NOOP":
                        self._say("250 ok")
                    elif verb == "DATA":
                        if not rcpts:
                            self._say("503 need RCPT first")
                            continue
                        self._say("354 end data with <CRLF>.<CRLF>")
                        chunks, total, overflow = [], 0, False
                        while True:
                            dl = self.rfile.readline(1 << 20)
                            if not dl or dl.rstrip(b"\r\n") == b".":
                                break
                            if dl.startswith(b".."):  # dot-unstuffing
                                dl = dl[1:]
                            total += len(dl)
                            if total > max_message_bytes:
                                overflow = True
                                continue  # drain to terminator
                            chunks.append(dl)
                        if overflow:
                            self._say("552 message too large")
                        else:
                            writer.append(
                                {
                                    "payload": b"".join(chunks).decode(
                                        "utf-8", "replace"
                                    ),
                                    "mail_from": mail_from,
                                    "rcpt_to": ",".join(rcpts),
                                    "sender": self.client_address[0],
                                    "proto": "smtp",
                                }
                            )
                            self._say("250 ok: queued")
                        mail_from, rcpts = None, []
                    elif verb == "QUIT":
                        self._say("221 bye")
                        return
                    else:
                        self._say("502 not implemented")

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self.server = Server((host, port), Handler)
        self._start()


class ListenRELP(_Listener):
    """RELP listener (ListenRELP.java + relp/frame/RELPFrame.java,
    relp/handler/RELPFrameHandler.java, relp/response/RELPResponse.java).

    Frame wire format: ``TXNR SP COMMAND SP DATALEN [SP DATA] LF``.
    Commands handled exactly as the reference's RELPFrameHandler:

    - ``open``  → echo the client's offers back in a ``rsp`` frame
      (``200 OK\\n<offers>``) immediately (RELPFrameHandler.java:75-79).
    - ``close`` → ``rsp 200 OK`` immediately, then end the connection
      (RELPFrameHandler.java:80-85).
    - anything else (normally ``syslog``) → spool one record
      ``{payload, txnr, command, sender, proto}``, and ack with
      ``rsp 200 OK`` only AFTER the event is committed — the
      reference acks in postProcess() *after* session.commit()
      (ListenRELP.java:127-135), which is what makes RELP reliable:
      an unacked event is retransmitted by the client, and LWW replay
      makes the retransmit idempotent downstream.

    ``ack_policy``:
      - ``"durable"`` (default; the reference's ordering): pending
        events are sealed to a parquet segment (``writer.flush()``)
        before their acks are written. Acks are batched per read-loop
        drain — pipelining clients get one fsync per window, not per
        event (NiFi similarly commits a whole batch of events per
        session before acking each).
      - ``"accept"``: ack after the spool append (the ListenMQTT QoS1
        bound — at most the unflushed buffer is lost, and those events
        were acked). Cheaper; use when the client redelivers anyway.
    """

    def __init__(
        self,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        partition: int = 0,
        segment_rows: int = 4096,
        max_frame_bytes: int = 16 << 20,
        ack_policy: str = "durable",
    ):
        if ack_policy not in ("durable", "accept"):
            raise ValueError(f"ack_policy must be durable|accept, got {ack_policy!r}")
        self.writer = SpoolWriter(spool_dir, partition, segment_rows)
        writer = self.writer

        class Handler(socketserver.StreamRequestHandler):
            def _rsp(self, txnr: int, data: bytes):
                # RELPResponse.toFrame: TXNR SP "rsp" SP LEN SP DATA LF
                self.wfile.write(
                    b"%d rsp %d %s\n" % (txnr, len(data), data)
                )

            @staticmethod
            def _parse_frame(buf: bytearray):
                """Parse one complete frame off the front of ``buf``.
                Returns (txnr, command, data, n_consumed) or None if the
                buffer doesn't yet hold a whole frame. Raises ValueError
                on a malformed header."""
                # header: TXNR SP COMMAND SP DATALEN then SP+data LF | LF
                limit = min(len(buf), 257)
                s1 = buf.find(b" ", 0, limit)
                s2 = buf.find(b" ", s1 + 1, limit) if s1 >= 0 else -1
                if s1 < 0 or s2 < 0:
                    if len(buf) > 256:
                        raise ValueError("malformed RELP header")
                    return None
                p = s2 + 1
                while p < len(buf) and buf[p : p + 1].isdigit():
                    p += 1
                if p == s2 + 1 or p - s2 > 20:
                    if p < len(buf) or len(buf) > 256:
                        raise ValueError("malformed RELP header")
                    return None
                if p >= len(buf):
                    return None  # datalen digits may continue
                txnr_b, command_b = buf[:s1], buf[s1 + 1 : s2]
                if not txnr_b.isdigit():
                    raise ValueError("malformed RELP header")
                dlen = int(buf[s2 + 1 : p])
                if dlen > max_frame_bytes:
                    raise ValueError("frame too large")
                sep = buf[p : p + 1]
                if dlen == 0:
                    if sep != b"\n":
                        raise ValueError("datalen 0 needs LF trailer")
                    return int(txnr_b), command_b.decode("ascii"), b"", p + 1
                if sep != b" ":
                    raise ValueError("datalen > 0 but no data")
                end = p + 1 + dlen
                if len(buf) < end + 1:
                    return None  # wait for data + trailer
                if buf[end : end + 1] != b"\n":
                    raise ValueError("missing frame trailer")
                return (
                    int(txnr_b),
                    command_b.decode("ascii"),
                    bytes(buf[p + 1 : end]),
                    end + 1,
                )

            def handle(self):
                import select as _select

                sender = self.client_address[0]
                pending: list[int] = []  # spooled but unacked txnrs
                buf = bytearray()

                def drain_acks():
                    if not pending:
                        return
                    if ack_policy == "durable":
                        writer.flush()  # seal BEFORE acking (session.commit analog)
                    for t in pending:
                        self._rsp(t, b"200 OK")
                    pending.clear()

                try:
                    while True:
                        parsed = self._parse_frame(buf)
                        if parsed is None:
                            # need more bytes; before blocking, give a
                            # quiescent pipelining client its window acks
                            if pending:
                                r, _, _ = _select.select([self.connection], [], [], 0.05)
                                if not r:
                                    drain_acks()
                                    continue
                            chunk = self.connection.recv(65536)
                            if not chunk:
                                return
                            buf += chunk
                            continue
                        txnr, command, data, consumed = parsed
                        del buf[:consumed]
                        if command == "open":
                            drain_acks()
                            self._rsp(txnr, b"200 OK\n" + data)
                        elif command == "close":
                            drain_acks()
                            self._rsp(txnr, b"200 OK")
                            # serverclose frame ends the session (RELP spec)
                            self.wfile.write(b"0 serverclose 0\n")
                            return
                        else:
                            writer.append(
                                {
                                    "payload": data.decode("utf-8", "replace"),
                                    "txnr": txnr,
                                    "command": command,
                                    "sender": sender,
                                    "proto": "relp",
                                }
                            )
                            if ack_policy == "accept":
                                self._rsp(txnr, b"200 OK")
                            else:
                                pending.append(txnr)
                                if len(pending) >= 256:
                                    drain_acks()
                except (ValueError, ConnectionError):
                    # abnormal exit: the pending window stays unacked (never
                    # ack what wasn't sealed) → the client retransmits
                    return

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self.server = Server((host, port), Handler)
        self._start()


class ListenLumberjack(_Listener):
    """Lumberjack/beats protocol listener (nifi-lumberjack-bundle
    ListenLumberjack.java; frame grammar frame/LumberjackDecoder.java:51
    — frame types W/D/C/A — and the compressed-frame iteration in
    LumberjackDecoder.processDECOMPRESSED; event fields
    event/LumberjackEventFactory.java).

    Wire format: each frame is ``version(1B) type(1B) body``:

    - ``'W'`` window size: u32 — client announces the frame window.
    - ``'D'`` data: u32 seq, u32 pair_count, then pair_count ×
      (u32 klen, key, u32 vlen, value). One spooled record per frame:
      ``{payload ('line' value — the filebeat convention — else the
      field map as JSON), fields_json, seq, sender, proto}``.
    - ``'C'`` compressed: u32 len + zlib blob holding concatenated D
      frames ("3 data frames compressed into a single compressed
      frame") — inflated and iterated, one record + ack per embedded
      frame.
    - ``'A'`` ack (server→client): u32 seq, written only AFTER the
      record is accepted into the spool — the reference acks "after
      successfully writing the message to a FlowFile"
      (ListenLumberjack.java:67-69). An unacked frame is retransmitted
      by the client; LWW replay dedups the redelivery downstream.

    A malformed frame ends the connection without acking the tail
    (client retransmits), matching the reference's frame-exception
    channel teardown."""

    def __init__(
        self,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        partition: int = 0,
        segment_rows: int = 4096,
        max_frame_bytes: int = 16 << 20,
    ):
        self.writer = SpoolWriter(spool_dir, partition, segment_rows)
        writer = self.writer

        class Handler(socketserver.StreamRequestHandler):
            def _exact(self, n: int) -> bytes | None:
                data = self.rfile.read(n)
                return data if len(data) == n else None

            @staticmethod
            def _parse_data_body(buf: bytes, pos: int):
                """Parse one D-frame body at ``pos`` (past version+type).
                Returns (seq, fields: dict, new_pos) or raises ValueError."""
                import struct

                if pos + 8 > len(buf):
                    raise ValueError("short data frame")
                seq, count = struct.unpack_from(">II", buf, pos)
                pos += 8
                fields = {}
                for _ in range(count):
                    if pos + 4 > len(buf):
                        raise ValueError("short pair")
                    (klen,) = struct.unpack_from(">I", buf, pos)
                    pos += 4
                    key = buf[pos : pos + klen].decode("utf-8", "replace")
                    pos += klen
                    if pos + 4 > len(buf):
                        raise ValueError("short pair value")
                    (vlen,) = struct.unpack_from(">I", buf, pos)
                    pos += 4
                    fields[key] = buf[pos : pos + vlen].decode("utf-8", "replace")
                    pos += vlen
                if pos > len(buf):
                    raise ValueError("pair overruns frame")
                return seq, fields, pos

            def _spool_and_ack(self, seq: int, fields: dict, sender: str):
                import json as _json

                writer.append(
                    {
                        "payload": fields.get("line", _json.dumps(fields, sort_keys=True)),
                        "fields_json": _json.dumps(fields, sort_keys=True),
                        "seq": seq,
                        "sender": sender,
                        "proto": "lumberjack",
                    }
                )
                # ack strictly after spool accept (version '1', type 'A')
                import struct

                self.wfile.write(b"1A" + struct.pack(">I", seq))
                self.wfile.flush()

            def handle(self):
                import struct
                import zlib

                sender = self.client_address[0]
                while True:
                    hdr = self._exact(2)
                    if hdr is None:
                        return
                    version, ftype = hdr[0:1], hdr[1:2]
                    if version not in (b"1", b"2"):
                        return  # protocol error: drop, client retransmits
                    if ftype == b"W":
                        if self._exact(4) is None:
                            return
                    elif ftype == b"D":
                        body = bytearray()
                        peek = self._exact(8)
                        if peek is None:
                            return
                        _seq, count = struct.unpack(">II", peek)
                        body += peek
                        for _ in range(count * 2):  # k then v, length-prefixed
                            ln_b = self._exact(4)
                            if ln_b is None:
                                return
                            (ln,) = struct.unpack(">I", ln_b)
                            if ln > max_frame_bytes:
                                return
                            val = self._exact(ln)
                            if val is None:
                                return
                            body += ln_b + val
                        try:
                            seq, fields, _ = self._parse_data_body(bytes(body), 0)
                        except ValueError:
                            return
                        self._spool_and_ack(seq, fields, sender)
                    elif ftype == b"C":
                        ln_b = self._exact(4)
                        if ln_b is None:
                            return
                        (ln,) = struct.unpack(">I", ln_b)
                        if ln > max_frame_bytes:
                            return
                        blob = self._exact(ln)
                        if blob is None:
                            return
                        try:
                            raw = zlib.decompress(blob)
                        except zlib.error:
                            return
                        pos = 0
                        while pos < len(raw):
                            # v1 D frames only, matching the uncompressed
                            # path: a v2 J frame's JSON payload length
                            # would be misread as a key/value pair count
                            # by _parse_data_body (reference
                            # LumberjackDecoder is v1 W/D/C only)
                            if raw[pos : pos + 1] not in (b"1", b"2") or raw[
                                pos + 1 : pos + 2
                            ] != b"D":
                                return
                            try:
                                seq, fields, pos = self._parse_data_body(
                                    raw, pos + 2
                                )
                            except ValueError:
                                return
                            self._spool_and_ack(seq, fields, sender)
                    else:
                        return

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self.server = Server((host, port), Handler)
        self._start()


class ListenAMQP(_Listener):
    """AMQP 0-9-1 ingest edge (reference nifi-amqp-bundle ConsumeAMQP
    consumes from an external broker via the RabbitMQ client; this
    sandbox has no broker or client libs, so — like ListenMQTT — the
    engine IS the broker edge): a server-side subset of the public
    AMQP 0-9-1 spec speaking the connection/channel handshake,
    ``basic.publish`` (method frame → content header → body frames)
    and publisher confirms (``confirm.select`` → per-message
    ``basic.ack``). The Basic.Ack for a published message is written
    only AFTER the message is appended to the durable spool — the same
    ack-after-accept (commit-after-session) ordering as ListenRELP and
    ListenMQTT QoS1, which is the semantics ConsumeAMQP's
    ack-after-session provides on the consumer side.

    Spools ``{payload, exchange, routing_key, confirmed, sender,
    proto}`` per message. Unsupported classes (basic.consume, tx, …)
    close the channel loudly rather than misparse.

    Wire format (spec §2.3): frame = type(1) channel(2) size(4)
    payload(size) 0xCE; method payload = class-id(2) method-id(2) args.
    """

    _FRAME_END = 0xCE

    def __init__(
        self,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        partition: int = 0,
        segment_rows: int = 4096,
        max_message_bytes: int = 16 << 20,
    ):
        import struct

        self.writer = SpoolWriter(spool_dir, partition, segment_rows)
        writer = self.writer
        frame_end = self._FRAME_END

        def shortstr(s: bytes) -> bytes:
            return bytes([len(s)]) + s

        def longstr(s: bytes) -> bytes:
            return struct.pack(">I", len(s)) + s

        class Handler(socketserver.StreamRequestHandler):
            def _frame(self, ftype: int, channel: int, payload: bytes):
                self.wfile.write(
                    struct.pack(">BHI", ftype, channel, len(payload))
                    + payload
                    + bytes([frame_end])
                )

            def _method(self, channel: int, cls: int, meth: int, args: bytes = b""):
                self._frame(1, channel, struct.pack(">HH", cls, meth) + args)

            def _read_frame(self):
                h = self.rfile.read(7)
                if len(h) < 7:
                    return None
                ftype, channel, size = struct.unpack(">BHI", h)
                if size > max_message_bytes:
                    return None
                payload = self.rfile.read(size)
                end = self.rfile.read(1)
                if len(payload) < size or end != bytes([frame_end]):
                    return None
                return ftype, channel, payload

            def handle(self):
                try:
                    hdr = self.rfile.read(8)
                    if hdr != b"AMQP\x00\x00\x09\x01":
                        # spec §4.2.2: answer with the supported
                        # protocol header and close
                        self.wfile.write(b"AMQP\x00\x00\x09\x01")
                        return
                    # Connection.Start: ver 0.9, empty server-props,
                    # PLAIN mechanisms, en_US locales
                    self._method(
                        0, 10, 10,
                        b"\x00\x09" + longstr(b"") + longstr(b"PLAIN")
                        + longstr(b"en_US"),
                    )
                    confirm = {}  # channel -> next delivery tag (confirm mode)
                    pending = {}  # channel -> publish awaiting header/body
                    while True:
                        fr = self._read_frame()
                        if fr is None:
                            return
                        ftype, channel, payload = fr
                        if ftype == 8:  # heartbeat
                            self._frame(8, 0, b"")
                            continue
                        if ftype == 2:  # content header
                            p = pending.get(channel)
                            if p is None:
                                return
                            body_size = struct.unpack(">Q", payload[4:12])[0]
                            if body_size > max_message_bytes:
                                return
                            p["remaining"] = body_size
                            p["body"] = bytearray()
                            if body_size == 0:
                                self._complete(channel, pending, confirm)
                            continue
                        if ftype == 3:  # content body
                            p = pending.get(channel)
                            if p is None or "remaining" not in p:
                                return
                            p["body"] += payload
                            p["remaining"] -= len(payload)
                            if p["remaining"] < 0:
                                # body exceeds the declared content-header
                                # size: a corrupt frame sequence — drop the
                                # connection UNACKED rather than spool and
                                # confirm garbage (same loud-close contract
                                # as unsupported classes)
                                return
                            if p["remaining"] == 0:
                                self._complete(channel, pending, confirm)
                            continue
                        if ftype != 1:
                            return
                        cls, meth = struct.unpack(">HH", payload[:4])
                        args = payload[4:]
                        if (cls, meth) == (10, 11):  # Connection.StartOk
                            # Tune: channel-max 0, frame-max 128K, no heartbeat
                            self._method(
                                0, 10, 30, struct.pack(">HIH", 0, 131072, 0)
                            )
                        elif (cls, meth) == (10, 31):  # Connection.TuneOk
                            pass
                        elif (cls, meth) == (10, 40):  # Connection.Open
                            self._method(0, 10, 41, b"\x00")
                        elif (cls, meth) == (10, 50):  # Connection.Close
                            self._method(0, 10, 51)
                            return
                        elif (cls, meth) == (20, 10):  # Channel.Open
                            self._method(channel, 20, 11, longstr(b""))
                        elif (cls, meth) == (20, 40):  # Channel.Close
                            self._method(channel, 20, 41)
                            confirm.pop(channel, None)
                            pending.pop(channel, None)
                        elif (cls, meth) == (85, 10):  # Confirm.Select
                            confirm[channel] = 1
                            if not args or not (args[0] & 1):  # not nowait
                                self._method(channel, 85, 11)
                        elif (cls, meth) == (60, 40):  # Basic.Publish
                            pos = 2  # skip reserved-1
                            xlen = args[pos]
                            exchange = args[pos + 1 : pos + 1 + xlen]
                            pos += 1 + xlen
                            klen = args[pos]
                            rkey = args[pos + 1 : pos + 1 + klen]
                            pending[channel] = {
                                "exchange": exchange.decode("utf-8", "replace"),
                                "routing_key": rkey.decode("utf-8", "replace"),
                            }
                        else:
                            # unsupported class/method: Connection.Close
                            # 540 not-implemented (loud, never misparse)
                            reason = shortstr(b"not implemented")
                            self._method(
                                0, 10, 50,
                                struct.pack(">H", 540) + reason
                                + struct.pack(">HH", cls, meth),
                            )
                            return
                except (ConnectionError, OSError, struct.error, IndexError):
                    return

            def _complete(self, channel, pending, confirm):
                p = pending.pop(channel)
                writer.append(
                    {
                        "payload": bytes(p["body"]).decode("utf-8", "replace"),
                        "exchange": p["exchange"],
                        "routing_key": p["routing_key"],
                        "confirmed": channel in confirm,
                        "sender": self.client_address[0],
                        "proto": "amqp",
                    }
                )
                if channel in confirm:
                    # Basic.Ack AFTER the spool append: delivery-tag,
                    # multiple=0 — the durable-accept-then-ack ordering
                    tag = confirm[channel]
                    confirm[channel] = tag + 1
                    self._method(
                        channel, 60, 80, struct.pack(">QB", tag, 0)
                    )

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self.server = Server((host, port), Handler)
        self._start()


_STOMP_UNESC = {b"\\\\": b"\\", b"\\n": b"\n", b"\\r": b"\r", b"\\c": b":"}


def _stomp_unescape(v: bytes) -> str:
    out, i = bytearray(), 0
    while i < len(v):
        if v[i : i + 1] == b"\\":
            rep = _STOMP_UNESC.get(v[i : i + 2])
            if rep is None:
                raise ValueError("undefined STOMP escape")
            out += rep
            i += 2
        else:
            out.append(v[i])
            i += 1
    return out.decode("utf-8", "replace")


def _stomp_escape(v: str) -> str:
    return (
        v.replace("\\", "\\\\").replace("\r", "\\r")
        .replace("\n", "\\n").replace(":", "\\c")
    )


class ListenSTOMP(_Listener):
    """STOMP 1.2 broker edge — the open text protocol JMS brokers
    commonly expose (reference nifi-jms-bundle GetJMSQueue.java /
    JmsConsumer.java consume with CLIENT_ACKNOWLEDGE after session
    commit; the wire format here is the public STOMP 1.2 spec, not any
    broker's code): frame = COMMAND LF header-lines LF LF body NUL,
    CRLF allowed, header values escape ``\\\\ \\r \\n \\c``, a
    ``content-length`` header bounds binary bodies (otherwise the body
    ends at the first NUL), bare EOLs between frames are heart-beats.

    CONNECT/STOMP → CONNECTED (version:1.2). SEND spools
    ``{payload, destination, confirmed, sender, proto='stomp'}``; a
    SEND carrying a ``receipt`` header is answered with RECEIPT only
    AFTER the append — ``ack_policy='durable'`` (default) additionally
    seals the spool segment before any receipt in the drained window
    is written (the JMS client-ack ordering; receipts batch per
    read-loop drain exactly like ListenRELP's acks), ``'accept'`` acks
    after the append (the ListenMQTT QoS1 bound). DISCONNECT honors
    its receipt, then the connection ends. Any other command
    (SUBSCRIBE/BEGIN/...) gets a loud ERROR frame and a close — this
    edge is ingest-only, like ListenAMQP's 540 not-implemented."""

    def __init__(
        self,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        partition: int = 0,
        segment_rows: int = 4096,
        max_frame_bytes: int = 16 << 20,
        ack_policy: str = "durable",
    ):
        if ack_policy not in ("durable", "accept"):
            raise ValueError(f"ack_policy must be durable|accept, got {ack_policy!r}")
        self.writer = SpoolWriter(spool_dir, partition, segment_rows)
        writer = self.writer

        class Handler(socketserver.BaseRequestHandler):
            def _frame_out(self, command: str, headers, body: bytes = b""):
                head = command + "\n" + "".join(
                    f"{k}:{_stomp_escape(str(v))}\n" for k, v in headers
                ) + "\n"
                self.request.sendall(head.encode() + body + b"\x00")

            @staticmethod
            def _parse_frame(buf: bytearray):
                """One complete frame off the front of ``buf`` →
                (command, headers, body, n_consumed) or None if
                incomplete. Raises ValueError on malformed input."""
                i = 0  # heart-beats / inter-frame EOLs
                while i < len(buf) and buf[i : i + 1] in (b"\n", b"\r"):
                    i += 1
                if i == len(buf):
                    return None if i == 0 else ("", {}, b"", i)
                ends = [
                    (j, 2) for j in (buf.find(b"\n\n", i),) if j >= 0
                ] + [
                    (j, 3) for j in (buf.find(b"\n\r\n", i),) if j >= 0
                ]
                if not ends:
                    if len(buf) - i > max_frame_bytes:
                        raise ValueError("unterminated frame header")
                    return None
                he, dlen = min(ends)
                lines = bytes(buf[i:he]).split(b"\n")
                command = lines[0].rstrip(b"\r").decode("ascii", "replace")
                headers: dict[str, str] = {}
                for ln in lines[1:]:
                    ln = ln.rstrip(b"\r")
                    c = ln.find(b":")
                    if c < 0:
                        raise ValueError("header line without colon")
                    k = ln[:c].decode("utf-8", "replace")
                    if k not in headers:  # spec: first occurrence wins
                        headers[k] = _stomp_unescape(ln[c + 1 :])
                body_start = he + dlen
                if "content-length" in headers:
                    cl = int(headers["content-length"])
                    if cl > max_frame_bytes:
                        raise ValueError("frame too large")
                    end = body_start + cl
                    if len(buf) < end + 1:
                        return None
                    if buf[end : end + 1] != b"\x00":
                        raise ValueError("content-length does not reach NUL")
                else:
                    end = buf.find(b"\x00", body_start)
                    if end < 0:
                        if len(buf) - body_start > max_frame_bytes:
                            raise ValueError("unterminated frame body")
                        return None
                return command, headers, bytes(buf[body_start:end]), end + 1

            def handle(self):
                buf = bytearray()
                pending_receipts: list[str] = []

                def drain_receipts():
                    if pending_receipts:
                        if ack_policy == "durable":
                            writer.flush()
                        for rid in pending_receipts:
                            self._frame_out("RECEIPT", [("receipt-id", rid)])
                        pending_receipts.clear()

                while True:
                    try:
                        parsed = self._parse_frame(buf)
                    except (ValueError, UnicodeDecodeError) as e:
                        self._frame_out(
                            "ERROR", [("message", f"malformed frame: {e}")]
                        )
                        return
                    if parsed is None:
                        # no complete frame buffered → the pipelined
                        # window is drained; seal + receipt, then block
                        drain_receipts()
                        data = self.request.recv(65536)
                        if not data:
                            return
                        buf += data
                        continue
                    command, headers, body, consumed = parsed
                    del buf[:consumed]
                    if command == "":  # pure heart-beat bytes
                        continue
                    if command in ("CONNECT", "STOMP"):
                        self._frame_out(
                            "CONNECTED",
                            [("version", "1.2"), ("heart-beat", "0,0")],
                        )
                    elif command == "SEND":
                        writer.append(
                            {
                                "payload": body.decode("utf-8", "replace"),
                                "destination": headers.get("destination", ""),
                                "confirmed": "receipt" in headers,
                                "sender": self.client_address[0],
                                "proto": "stomp",
                            }
                        )
                        if "receipt" in headers:
                            pending_receipts.append(headers["receipt"])
                    elif command == "DISCONNECT":
                        if "receipt" in headers:
                            pending_receipts.append(headers["receipt"])
                        drain_receipts()
                        return
                    else:
                        drain_receipts()
                        self._frame_out(
                            "ERROR",
                            [("message", f"not implemented: {command}")],
                        )
                        return

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self.server = Server((host, port), Handler)
        self._start()


def spool_dataset(spool_dir: str, columns: list[str] | None = None):
    """Read every sealed segment of a spool as a Dataset (offset column
    included). For offset-tracked incremental consumption use
    ``SegmentConsumer(spool_dir, group_path)`` — the spool layout is a
    single-producer topic."""
    import ray.data

    files = sorted(glob.glob(os.path.join(spool_dir, "partition=*", "segment-*.parquet")))
    if not files:
        return ray.data.from_items([])
    return ray.data.read_parquet(files, columns=columns)
