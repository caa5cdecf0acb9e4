"""Socket / mail push egress — PutTCP / PutUDP / PutSyslog / PutEmail
analogs (reference nifi-standard-processors/src/main/java/org/apache/
nifi/processors/standard/PutTCP.java, PutUDP.java, PutSyslog.java and
nifi-email-bundle PutEmail.java).

Same contract as every other sink in this repo (``FtpPut``,
``HttpPut``): actor-pool ``map_batches`` stages whose per-actor state
is the CONNECTION (built once in ``__init__`` / lazily on first send,
reconnected once on failure — the reference's ChannelSender pool keeps
one sender per processor thread, PutTCP.java acquires/returns it per
flowfile), whose per-row work is one send, and which never raise: a
dead endpoint yields ``sent = false`` + ``error`` text so failures
route downstream (REL_FAILURE) instead of killing a whole block retry.
Success is stamped only after the OS accepted the bytes (TCP) / the
server acknowledged (SMTP 250) — ack-after-success, the session-commit
ordering every sink here shares.

Loopback-verified in tests against this repo's own listeners
(``sources/listen.ListenTCP/ListenUDP/ListenSMTP``), closing the
producer→consumer circle the same way FtpPut/MiniFtpServer does.
"""

from __future__ import annotations

import pyarrow as pa

_UDP_MAX = 65507  # RFC 768 practical datagram payload ceiling


class TcpPut:
    """PutTCP.java analog: send each row's ``content_col`` over ONE
    persistent TCP connection per actor, appending ``delimiter`` (the
    reference's Outgoing Message Delimiter). A send failure closes and
    reconnects once (PutTCP's sender-pool eviction), then routes the
    row to failure via ``sent``/``error`` columns."""

    proto = "tcp"

    def __init__(
        self,
        host: str,
        port: int,
        content_col: str = "content",
        delimiter: bytes = b"\n",
        timeout: float = 10.0,
    ):
        self.host, self.port = host, port
        self.content_col, self.delimiter, self.timeout = content_col, delimiter, timeout
        self._sock = None  # lazily connected; reconnect-once on failure

    def _connect(self):
        import socket

        s = socket.create_connection((self.host, self.port), timeout=self.timeout)
        return s

    def _close(self):
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass
            self._sock = None

    def _send(self, payload: bytes) -> str | None:
        data = memoryview(payload + self.delimiter)
        for attempt in (1, 2):  # reconnect once, like FtpFetch/FtpPut
            try:
                if self._sock is None:
                    self._sock = self._connect()
            except OSError as e:
                if attempt == 2:
                    return f"{type(e).__name__}: {e}"
                continue
            written = 0
            try:
                while written < len(data):
                    written += self._sock.send(data[written:])
                return None
            except OSError as e:
                self._close()
                # retry ONLY zero-byte failures (a stale pooled socket
                # the peer closed between rows — nothing entered any
                # stream). After a PARTIAL write, a resend would append
                # a full copy behind the fragment; under delimiter
                # framing that fabricates a truncated extra record with
                # a DIFFERENT payload, which LWW replay dedup cannot
                # absorb — route to the error column instead and let
                # the caller re-emit or quarantine the whole record.
                if written > 0:
                    return (
                        f"{type(e).__name__}: {e} "
                        f"({written}B partial frame in dead stream — not retried)"
                    )
                if attempt == 2:
                    return f"{type(e).__name__}: {e}"
        return "unreachable"

    def __call__(self, batch: pa.Table) -> pa.Table:
        sent, errs = [], []
        for c in batch[self.content_col].to_pylist():
            if c is None:
                sent.append(False), errs.append("null content")
                continue
            payload = c.encode() if isinstance(c, str) else bytes(c)
            e = self._send(payload)
            sent.append(e is None), errs.append(e)
        return batch.append_column("sent", pa.array(sent, pa.bool_())).append_column(
            "error", pa.array(errs, pa.string())
        )

    def __del__(self):  # actor teardown
        self._close()


class UdpPut(TcpPut):
    """PutUDP.java analog: one datagram per row. Datagrams above the
    UDP payload ceiling route to failure without a send (the reference
    rejects flowfiles larger than the max datagram size)."""

    proto = "udp"

    def _connect(self):
        import socket

        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.settimeout(self.timeout)
        s.connect((self.host, self.port))
        return s

    def _send(self, payload: bytes) -> str | None:
        if len(payload) > _UDP_MAX:
            return f"datagram too large ({len(payload)} > {_UDP_MAX})"
        for attempt in (1, 2):
            try:
                if self._sock is None:
                    self._sock = self._connect()
                self._sock.send(payload)  # no delimiter: datagram IS the frame
                return None
            except OSError as e:
                self._close()
                if attempt == 2:
                    return f"{type(e).__name__}: {e}"
        return "unreachable"


def format_syslog(
    batch: pa.Table,
    pri_col: str = "pri",
    ts_col: str = "ts",
    host_col: str = "host",
    body_col: str = "body",
    version: int | None = 1,
    out: str = "syslog_line",
) -> pa.Table:
    """Vectorized PutSyslog.java message builder + validator: composes
    ``<pri>[version ]timestamp hostname body`` per row and appends
    ``syslog_valid`` — rows with a non-numeric/missing priority, empty
    timestamp/hostname, or empty body are marked invalid and must NOT
    be sent (the reference routes them to REL_INVALID before any I/O,
    PutSyslog.java's valid-message check). Column stays present so the
    invalid rows keep flowing to their quarantine route."""
    import pyarrow.compute as pc

    pri = batch[pri_col]
    if pa.types.is_string(pri.type) or pa.types.is_large_string(pri.type):
        # non-numeric string priority = invalid row, never a raise
        pri_ok = pc.and_(pri.is_valid(), pc.match_substring_regex(pri, r"^\d+$"))
        pri_str = pc.if_else(pri_ok, pri, "0")  # placeholder, row is invalid anyway
    else:
        pri_ok = pc.and_(pri.is_valid(), pc.greater_equal(pri, 0))
        pri_str = pc.cast(pri, pa.string())
    nonempty = lambda col: pc.and_(  # noqa: E731
        col.is_valid(), pc.greater(pc.utf8_length(pc.cast(col, pa.string())), 0)
    )
    ok = pc.and_(pc.and_(pri_ok, nonempty(batch[ts_col])), nonempty(batch[host_col]))
    ok = pc.fill_null(pc.and_(ok, nonempty(batch[body_col])), False)

    ver = f"{version} " if version is not None else ""
    line = pc.binary_join_element_wise(
        "<",
        pri_str,
        ">" + ver,
        pc.cast(batch[ts_col], pa.string()),
        " ",
        pc.cast(batch[host_col], pa.string()),
        " ",
        pc.cast(batch[body_col], pa.string()),
        "",
    )
    line = pc.if_else(ok, line, pa.nulls(batch.num_rows, pa.string()))
    return batch.append_column(out, line).append_column("syslog_valid", ok)


class SyslogPut:
    """PutSyslog.java analog: format + validate + send in one actor
    stage. Invalid rows (``syslog_valid = false``) are never sent and
    carry ``sent = false, error = 'invalid syslog message'``; valid rows
    go over one persistent TCP connection (newline framed — matching
    ListenSyslog/RFC 6587 LF framing) or one UDP datagram each."""

    def __init__(
        self,
        host: str,
        port: int,
        proto: str = "tcp",
        pri_col: str = "pri",
        ts_col: str = "ts",
        host_col: str = "host",
        body_col: str = "body",
        version: int | None = 1,
        timeout: float = 10.0,
    ):
        cls = TcpPut if proto == "tcp" else UdpPut
        self.sender = cls(host, port, content_col="syslog_line", timeout=timeout)
        self.cols = (pri_col, ts_col, host_col, body_col)
        self.version = version

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        fmt = format_syslog(batch, *self.cols, version=self.version)
        valid_mask = fmt["syslog_valid"]
        to_send = fmt.filter(valid_mask)
        sent_tbl = self.sender(to_send) if to_send.num_rows else None

        # re-interleave send results with the skipped invalid rows
        sent, errs = [], []
        it = iter(
            zip(sent_tbl["sent"].to_pylist(), sent_tbl["error"].to_pylist())
        ) if sent_tbl is not None else iter(())
        for ok in valid_mask.to_pylist():
            if ok:
                s, e = next(it)
                sent.append(s), errs.append(e)
            else:
                sent.append(False), errs.append("invalid syslog message")
        return fmt.append_column("sent", pa.array(sent, pa.bool_())).append_column(
            "error", pa.array(errs, pa.string())
        )


class AmqpPut:
    """PublishAMQP analog (reference nifi-amqp-bundle
    .../processors/PublishAMQP.java — semantics only; the wire protocol
    is the public AMQP 0-9-1 spec §2.3): publish each row's
    ``content_col`` as one message over ONE persistent
    connection+channel per actor, in publisher-confirm mode — a row is
    ``sent`` only after the broker's ``Basic.Ack`` for its delivery tag
    arrives (ack-after-confirm, the same session-commit ordering every
    sink here shares; the reference relies on the channel's confirm
    ordering the same way). Reconnect-once; never raise.

    Loopback peer: ``sources/listen.ListenAMQP`` (the in-repo broker
    edge), closing the producer→broker→spool circle."""

    def __init__(
        self,
        host: str,
        port: int,
        content_col: str = "content",
        exchange: str = "",
        routing_key: str = "events",
        timeout: float = 10.0,
        frame_max: int = 65536,
    ):
        self.host, self.port, self.timeout = host, port, timeout
        self.content_col = content_col
        self.exchange, self.routing_key = exchange, routing_key
        self.frame_max = frame_max
        self._conn = None  # (socket, rwb file)
        self._tag = 0  # next expected publisher-confirm delivery tag - 1

    # -- framing ------------------------------------------------------
    def _frame(self, f, ftype: int, channel: int, payload: bytes):
        import struct

        f.write(struct.pack(">BHI", ftype, channel, len(payload)) + payload + b"\xce")

    def _method(self, f, channel: int, cls: int, meth: int, args: bytes = b""):
        import struct

        self._frame(f, 1, channel, struct.pack(">HH", cls, meth) + args)

    def _read_frame(self, f):
        import struct

        h = f.read(7)
        if len(h) < 7:
            raise ConnectionError("short frame header")
        ftype, channel, size = struct.unpack(">BHI", h)
        payload = f.read(size)
        if len(payload) < size or f.read(1) != b"\xce":
            raise ConnectionError("bad frame")
        return ftype, channel, payload

    def _expect(self, f, cls: int, meth: int) -> bytes:
        import struct

        while True:
            ftype, _ch, payload = self._read_frame(f)
            if ftype == 8:  # heartbeat — answer and keep waiting
                self._frame(f, 8, 0, b"")
                f.flush()
                continue
            if ftype != 1:
                raise ConnectionError(f"unexpected frame type {ftype}")
            got = struct.unpack(">HH", payload[:4])
            if got == (10, 50):  # server Connection.Close (e.g. 540)
                code = struct.unpack(">H", payload[4:6])[0]
                raise ConnectionError(f"server Connection.Close {code}")
            if got != (cls, meth):
                raise ConnectionError(f"expected {(cls, meth)}, got {got}")
            return payload[4:]

    # -- connection ---------------------------------------------------
    def _connect(self):
        import socket
        import struct

        s = socket.create_connection((self.host, self.port), timeout=self.timeout)
        f = s.makefile("rwb")
        f.write(b"AMQP\x00\x00\x09\x01")
        f.flush()
        self._expect(f, 10, 10)  # Connection.Start
        args = struct.pack(">I", 0) + b"\x05PLAIN" + struct.pack(">I", 0) + b"\x05en_US"
        self._method(f, 0, 10, 11, args)  # StartOk
        f.flush()
        self._expect(f, 10, 30)  # Tune
        self._method(f, 0, 10, 31, struct.pack(">HIH", 0, self.frame_max, 0))  # TuneOk
        self._method(f, 0, 10, 40, b"\x01/\x00\x00")  # Open vhost "/"
        f.flush()
        self._expect(f, 10, 41)  # OpenOk
        self._method(f, 1, 20, 10, b"\x00")  # Channel.Open
        f.flush()
        self._expect(f, 20, 11)  # Channel.OpenOk
        self._method(f, 1, 85, 10, b"\x00")  # Confirm.Select (nowait=0)
        f.flush()
        self._expect(f, 85, 11)  # Confirm.SelectOk
        self._conn = (s, f)
        self._tag = 0

    def _close(self):
        if self._conn is not None:
            try:
                self._conn[1].close()
                self._conn[0].close()
            except OSError:
                pass
            self._conn = None

    def _publish(self, payload: bytes) -> str | None:
        import struct

        for attempt in (1, 2):
            try:
                if self._conn is None:
                    self._connect()
                _s, f = self._conn
                ex, rk = self.exchange.encode(), self.routing_key.encode()
                args = (
                    struct.pack(">H", 0)
                    + bytes([len(ex)]) + ex
                    + bytes([len(rk)]) + rk
                    + b"\x00"  # mandatory/immediate bits clear
                )
                self._method(f, 1, 60, 40, args)  # Basic.Publish
                # content header: class 60, weight 0, body size, no props
                self._frame(f, 2, 1, struct.pack(">HHQH", 60, 0, len(payload), 0))
                for i in range(0, len(payload), self.frame_max):
                    self._frame(f, 3, 1, payload[i : i + self.frame_max])
                f.flush()
                self._tag += 1
                ack = self._expect(f, 60, 80)  # Basic.Ack
                (tag,) = struct.unpack(">Q", ack[:8])
                if tag != self._tag:
                    raise ConnectionError(f"confirm tag {tag} != {self._tag}")
                return None
            except (OSError, ConnectionError, struct.error) as e:
                self._close()
                if attempt == 2:
                    return f"{type(e).__name__}: {e}"
        return "unreachable"

    def __call__(self, batch: pa.Table) -> pa.Table:
        sent, errs = [], []
        for c in batch[self.content_col].to_pylist():
            if c is None:
                sent.append(False), errs.append("null content")
                continue
            e = self._publish(c.encode() if isinstance(c, str) else bytes(c))
            sent.append(e is None), errs.append(e)
        return batch.append_column("sent", pa.array(sent, pa.bool_())).append_column(
            "error", pa.array(errs, pa.string())
        )

    def __del__(self):
        self._close()


class StompPut:
    """PublishJMS analog over STOMP 1.2 (reference nifi-jms-bundle
    PutJMS.java semantics — publish with per-message acknowledgement;
    the wire format is the public STOMP 1.2 spec): publish each row's
    ``content_col`` as one SEND over ONE persistent connection per
    actor, each frame carrying a unique ``receipt`` header and a
    ``content-length`` — a row is ``sent`` only after the broker's
    matching RECEIPT arrives (ack-after-confirm, the shared sink
    ordering). Reconnect-once; never raise.

    Loopback peer: ``sources/listen.ListenSTOMP``."""

    def __init__(
        self,
        host: str,
        port: int,
        content_col: str = "content",
        destination: str = "/queue/events",
        timeout: float = 10.0,
    ):
        self.host, self.port, self.timeout = host, port, timeout
        self.content_col = content_col
        self.destination = destination
        self._conn = None  # (socket, rb file)
        self._rid = 0

    def _read_frame(self, f):
        lines = []
        while True:  # command line, skipping inter-frame EOLs
            ln = f.readline()
            if not ln:
                raise ConnectionError("connection closed")
            ln = ln.rstrip(b"\r\n")
            if ln:
                lines.append(ln)
                break
        headers = {}
        while True:
            ln = f.readline()
            if not ln:
                raise ConnectionError("connection closed mid-header")
            ln = ln.rstrip(b"\r\n")
            if not ln:
                break
            k, _, v = ln.partition(b":")
            headers.setdefault(k.decode(), v.decode())
        body = bytearray()  # server frames here carry no content-length
        while True:
            c = f.read(1)
            if not c:
                raise ConnectionError("connection closed mid-body")
            if c == b"\x00":
                break
            body += c
        return lines[0].decode(), headers, bytes(body)

    def _connect(self):
        import socket

        s = socket.create_connection((self.host, self.port), timeout=self.timeout)
        f = s.makefile("rb")
        s.sendall(
            b"CONNECT\naccept-version:1.2\nhost:%s\n\n\x00" % self.host.encode()
        )
        cmd, headers, _ = self._read_frame(f)
        if cmd != "CONNECTED":
            raise ConnectionError(f"expected CONNECTED, got {cmd}")
        self._conn = (s, f)

    def _close(self):
        if self._conn is not None:
            try:
                self._conn[1].close()
                self._conn[0].close()
            except OSError:
                pass
            self._conn = None

    def _send_one(self, payload: bytes) -> str | None:
        for attempt in (1, 2):
            try:
                if self._conn is None:
                    self._connect()
                s, f = self._conn
                self._rid += 1
                rid = f"r-{self._rid}"
                head = (
                    f"SEND\ndestination:{self.destination}\n"
                    f"receipt:{rid}\ncontent-length:{len(payload)}\n\n"
                ).encode()
                s.sendall(head + payload + b"\x00")
                cmd, headers, _ = self._read_frame(f)
                if cmd == "ERROR":
                    raise ConnectionError(
                        f"broker ERROR: {headers.get('message', '')}"
                    )
                if cmd != "RECEIPT" or headers.get("receipt-id") != rid:
                    raise ConnectionError(f"expected RECEIPT {rid}, got {cmd}")
                return None
            except (OSError, ConnectionError) as e:
                self._close()
                if attempt == 2:
                    return f"{type(e).__name__}: {e}"
        return "unreachable"

    def __call__(self, batch: pa.Table) -> pa.Table:
        sent, errs = [], []
        for c in batch[self.content_col].to_pylist():
            if c is None:
                sent.append(False), errs.append("null content")
                continue
            e = self._send_one(c.encode() if isinstance(c, str) else bytes(c))
            sent.append(e is None), errs.append(e)
        return batch.append_column("sent", pa.array(sent, pa.bool_())).append_column(
            "error", pa.array(errs, pa.string())
        )

    def __del__(self):
        self._close()


class EmailPut:
    """PutEmail.java analog: build one RFC-822 message per row
    (from/to/subject + ``body_col``; optional ``attach_col`` bytes
    become a base64 MIME part, the reference's Attach-File property)
    and send it over ONE persistent SMTP connection per actor
    (smtplib, connected lazily, reconnect-once). Success only after the
    server's 250 to DATA — ack-after-acceptance. Failures never raise.

    Output columns: ``sent`` bool, ``error`` string|null."""

    def __init__(
        self,
        host: str,
        port: int,
        from_col: str = "mail_from",
        to_col: str = "mail_to",
        subject_col: str = "subject",
        body_col: str = "body",
        attach_col: str | None = None,
        timeout: float = 10.0,
    ):
        self.host, self.port, self.timeout = host, port, timeout
        self.cols = (from_col, to_col, subject_col, body_col)
        self.attach_col = attach_col
        self._smtp = None

    def _connect(self):
        import smtplib

        return smtplib.SMTP(self.host, self.port, timeout=self.timeout)

    def _close(self):
        if self._smtp is not None:
            try:
                self._smtp.close()
            except OSError:
                pass
            self._smtp = None

    def _build(self, frm, to, subject, body, attachment) -> str:
        from email.message import EmailMessage

        msg = EmailMessage()
        msg["From"], msg["To"], msg["Subject"] = frm, to, subject or ""
        msg.set_content(body or "")
        if attachment is not None:
            msg.add_attachment(
                bytes(attachment),
                maintype="application",
                subtype="octet-stream",
                filename="attachment.bin",
            )
        return msg.as_string()

    def _send(self, frm, to, raw) -> str | None:
        for attempt in (1, 2):
            try:
                if self._smtp is None:
                    self._smtp = self._connect()
                self._smtp.sendmail(frm, [t.strip() for t in to.split(",")], raw)
                return None
            except Exception as e:  # noqa: BLE001 — smtplib raises many types
                self._close()
                if attempt == 2:
                    return f"{type(e).__name__}: {e}"
        return "unreachable"

    def __call__(self, batch: pa.Table) -> pa.Table:
        frm_c, to_c, subj_c, body_c = (batch[c].to_pylist() for c in self.cols)
        att_c = (
            batch[self.attach_col].to_pylist()
            if self.attach_col
            else [None] * batch.num_rows
        )
        sent, errs = [], []
        for frm, to, subj, body, att in zip(frm_c, to_c, subj_c, body_c, att_c):
            if not frm or not to:
                sent.append(False), errs.append("missing from/to address")
                continue
            e = self._send(frm, to, self._build(frm, to, subj, body, att))
            sent.append(e is None), errs.append(e)
        return batch.append_column("sent", pa.array(sent, pa.bool_())).append_column(
            "error", pa.array(errs, pa.string())
        )

    def __del__(self):
        self._close()
