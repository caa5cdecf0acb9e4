"""Log/format parsers and content sniffing — ParseSyslog, ParseCEF,
IdentifyMimeType analogs (reference
nifi-standard-processors/.../standard/ParseSyslog.java:150,
ParseCEF.java:327; STD/IdentifyMimeType.java:168 uses Tika — here a
magic-byte table covers the formats this engine moves).

Parsers are actor-pool-friendly callable classes: regexes compile once
per actor (__init__), parsing is per-line (syslog/CEF are line
protocols; the loop over rows is the operator).
"""

from __future__ import annotations

import re

import pyarrow as pa

# RFC3164/RFC5424-ish: <pri>[version ]timestamp host tag: msg
_SYSLOG_3164 = re.compile(
    r"^<(?P<pri>\d{1,3})>"
    r"(?P<ts>[A-Z][a-z]{2}\s+\d{1,2}\s\d{2}:\d{2}:\d{2})\s"
    r"(?P<host>\S+)\s"
    r"(?P<tag>[^:\[\s]+)(?:\[(?P<pid>\d+)\])?:?\s?"
    r"(?P<msg>.*)$"
)
_SYSLOG_5424 = re.compile(
    r"^<(?P<pri>\d{1,3})>(?P<ver>\d)\s"
    r"(?P<ts>\S+)\s(?P<host>\S+)\s(?P<app>\S+)\s(?P<procid>\S+)\s(?P<msgid>\S+)"
    r"\s(?:\[.*?\]|-)\s?(?P<msg>.*)$"
)


class ParseSyslog:
    """Actor-pool stage: parse a syslog line column into typed columns
    (severity/facility derived from pri exactly as the reference does:
    facility = pri / 8, severity = pri % 8 — ParseSyslog.java:150)."""

    def __init__(self, col: str = "line"):
        self.col = col
        self.re3164, self.re5424 = _SYSLOG_3164, _SYSLOG_5424

    def __call__(self, batch: pa.Table) -> pa.Table:
        sev, fac, host, body, valid = [], [], [], [], []
        for line in batch[self.col].to_pylist():
            m = None
            if line:
                m = self.re5424.match(line) or self.re3164.match(line)
            if m is None:
                sev.append(None), fac.append(None), host.append(None)
                body.append(None), valid.append(False)
                continue
            pri = int(m.group("pri"))
            sev.append(pri % 8)
            fac.append(pri // 8)
            host.append(m.group("host"))
            body.append(m.group("msg"))
            valid.append(True)
        return (
            batch.append_column("syslog_severity", pa.array(sev, pa.int32()))
            .append_column("syslog_facility", pa.array(fac, pa.int32()))
            .append_column("syslog_hostname", pa.array(host, pa.string()))
            .append_column("syslog_body", pa.array(body, pa.string()))
            .append_column("syslog_valid", pa.array(valid, pa.bool_()))
        )


class ParseCEF:
    """Actor-pool stage: ArcSight CEF lines →
    CEF:version|vendor|product|device_version|signature|name|severity|extensions.
    Header fields become columns; the extension key=value tail becomes a
    map<string,string> column (ParseCEF.java:327 emits them as
    attributes — a typed map column is the Arrow-native equivalent)."""

    HEADER = ("cef_version", "cef_vendor", "cef_product", "cef_device_version",
              "cef_signature", "cef_name", "cef_severity")

    def __init__(self, col: str = "line"):
        self.col = col
        # split on unescaped pipes; CEF escapes \| and \\ in headers
        self.split_re = re.compile(r"(?<!\\)\|")
        self.ext_re = re.compile(r"(\w+)=((?:[^=]|=(?!\S+=))*?)(?=\s+\w+=|$)")

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in self.HEADER}
        exts: list[dict | None] = []
        valid = []
        for line in batch[self.col].to_pylist():
            if not line or not line.startswith("CEF:"):
                for k in self.HEADER:
                    cols[k].append(None)
                exts.append(None), valid.append(False)
                continue
            parts = self.split_re.split(line[4:], maxsplit=7)
            if len(parts) < 7:
                for k in self.HEADER:
                    cols[k].append(None)
                exts.append(None), valid.append(False)
                continue
            for k, v in zip(self.HEADER, parts[:7]):
                cols[k].append(v.replace(r"\|", "|").replace("\\\\", "\\"))
            tail = parts[7] if len(parts) > 7 else ""
            exts.append({m.group(1): m.group(2) for m in self.ext_re.finditer(tail)})
            valid.append(True)
        for k in self.HEADER:
            batch = batch.append_column(k, pa.array(cols[k], pa.string()))
        batch = batch.append_column(
            "cef_extensions", pa.array(exts, pa.map_(pa.string(), pa.string()))
        )
        return batch.append_column("cef_valid", pa.array(valid, pa.bool_()))


# magic-byte table (first-stage sniffing of every heterogeneous ingest;
# Tika-lite — the formats this engine's multimodal/codec stages move)
_MAGIC: list[tuple[bytes, str]] = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"%PDF-", "application/pdf"),
    (b"PK\x03\x04", "application/zip"),
    (b"\x1f\x8b", "application/gzip"),
    (b"BZh", "application/x-bzip2"),
    (b"\xfd7zXZ\x00", "application/x-xz"),
    (b"PAR1", "application/vnd.apache.parquet"),
    (b"Obj\x01", "avro/binary"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mpeg"),
    (b"\x00\x00\x00\x1cftyp", "video/mp4"),
]


def identify_mime(col: str, out: str = "mime_type"):
    """map_batches body: magic-byte content sniffing → mime.type column
    (IdentifyMimeType semantics; falls back to xml/json/text heuristics,
    then application/octet-stream)."""

    def sniff(b: bytes | None) -> str | None:
        if b is None:
            return None
        for magic, mime in _MAGIC:
            if b.startswith(magic):
                return mime
        head = b[:256].lstrip()
        if head.startswith(b"<?xml") or head.startswith(b"<"):
            return "application/xml"
        if head[:1] in (b"{", b"["):
            return "application/json"
        try:
            b[:1024].decode("utf-8")
            return "text/plain"
        except UnicodeDecodeError:
            return "application/octet-stream"

    def fn(batch: pa.Table) -> pa.Table:
        vals = [
            sniff(v if isinstance(v, (bytes, type(None))) else str(v).encode())
            for v in batch[col].to_pylist()
        ]
        return batch.append_column(out, pa.array(vals, pa.string()))

    return fn


class ParseEmail:
    """Actor-pool stage: RFC-822 message bytes → header columns + body
    text + one row per attachment via explode=True (ExtractEmailHeaders
    / ExtractEmailAttachments analogs, reference
    nifi-email-bundle/.../email/ExtractEmailHeaders.java,
    ExtractEmailAttachments.java — semantics only; stdlib email parser).
    """

    def __init__(self, col: str = "raw", explode_attachments: bool = False):
        from email import policy
        from email.parser import BytesParser

        self.col = col
        self.explode = explode_attachments
        self.parser = BytesParser(policy=policy.default)

    def __call__(self, batch: pa.Table) -> pa.Table:
        frm, to, subj, date, body = [], [], [], [], []
        att_parent, att_name, att_payload = [], [], []
        for i, raw in enumerate(batch[self.col].to_pylist()):
            if raw is None:
                frm.append(None), to.append(None), subj.append(None)
                date.append(None), body.append(None)
                continue
            if isinstance(raw, str):
                raw = raw.encode()
            msg = self.parser.parsebytes(raw)
            frm.append(msg.get("From"))
            to.append(msg.get("To"))
            subj.append(msg.get("Subject"))
            date.append(msg.get("Date"))
            b = msg.get_body(preferencelist=("plain",))
            body.append(b.get_content() if b is not None else None)
            if self.explode:
                for part in msg.iter_attachments():
                    att_parent.append(i)
                    att_name.append(part.get_filename())
                    att_payload.append(part.get_payload(decode=True) or b"")
        out = (
            batch.append_column("email_from", pa.array(frm, pa.string()))
            .append_column("email_to", pa.array(to, pa.string()))
            .append_column("email_subject", pa.array(subj, pa.string()))
            .append_column("email_date", pa.array(date, pa.string()))
            .append_column("email_body", pa.array(body, pa.string()))
        )
        if not self.explode:
            return out
        idx = pa.array(att_parent, pa.int64())
        expl = out.take(idx)
        expl = expl.append_column("attachment_name", pa.array(att_name, pa.string()))
        return expl.append_column("attachment", pa.array(att_payload, pa.binary()))


class ParseHL7:
    """Actor-pool stage: HL7 v2 pipe-delimited messages → typed columns
    (ExtractHL7Attributes analog, reference
    nifi-hl7-bundle/.../hl7/ExtractHL7Attributes.java — semantics only;
    plain segment/field splitting, no terminology validation).

    Emits message-level columns from MSH (sending app/facility, message
    type, control id, version) plus a map<segment-field, value> column
    of every populated field — the Arrow-typed form of the reference's
    attribute explosion."""

    def __init__(self, col: str = "message"):
        self.col = col

    @staticmethod
    def _parse(text: str):
        segs = [s for s in text.replace("\n", "\r").split("\r") if s]
        if not segs or not segs[0].startswith("MSH"):
            return None
        fields: dict[str, str] = {}
        counts: dict[str, int] = {}
        for seg in segs:
            parts = seg.split("|")
            name = parts[0]
            counts[name] = counts.get(name, 0) + 1
            rep = f"{name}_{counts[name]}" if counts[name] > 1 else name
            # MSH's first field IS the separator itself: offset by one
            start = 2 if name == "MSH" else 1
            for i, val in enumerate(parts[start:], start=start):
                if val:
                    fields[f"{rep}.{i}"] = val
        msh = segs[0].split("|")

        def f(i):
            return msh[i] if i < len(msh) and msh[i] else None

        return {
            "sending_app": f(2),
            "sending_facility": f(3),
            "message_type": f(8),
            "control_id": f(9),
            "version": f(11),
            "fields": fields,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        app, fac, mtype, cid, ver, fields, valid = [], [], [], [], [], [], []
        for text in batch[self.col].to_pylist():
            p = self._parse(text) if text else None
            if p is None:
                app.append(None), fac.append(None), mtype.append(None)
                cid.append(None), ver.append(None), fields.append(None)
                valid.append(False)
                continue
            app.append(p["sending_app"]), fac.append(p["sending_facility"])
            mtype.append(p["message_type"]), cid.append(p["control_id"])
            ver.append(p["version"]), fields.append(p["fields"]), valid.append(True)
        return (
            batch.append_column("hl7_sending_app", pa.array(app, pa.string()))
            .append_column("hl7_sending_facility", pa.array(fac, pa.string()))
            .append_column("hl7_message_type", pa.array(mtype, pa.string()))
            .append_column("hl7_control_id", pa.array(cid, pa.string()))
            .append_column("hl7_version", pa.array(ver, pa.string()))
            .append_column("hl7_fields", pa.array(fields, pa.map_(pa.string(), pa.string())))
            .append_column("hl7_valid", pa.array(valid, pa.bool_()))
        )


# ---- graded email fixture corpus -------------------------------------
# Pure functions of the row index, shared by the graded email_parse
# query (which renders them to RFC-822 bytes) and its expected-oracle
# builder (which recomputes every parsed column without the email
# parser) — the same dual-pinning contract as synth_mp4_table /
# synth_evtx_table.

EMAIL_FIXTURE_DATE = "Tue, 14 Nov 2023 22:13:20 +0000"


def email_fixture_fields(i: int) -> dict:
    return {
        "from": f"sender{i}@example.test",
        "to": f"rcpt{i}@example.test",
        "subject": f"msg {i:04d}",
        "date": EMAIL_FIXTURE_DATE,
        # stdlib set_content() appends the trailing newline on render,
        # so the spec-side body carries it too
        "body": f"body {i} " + "x" * (i % 7) + "\n",
        "attachment_name": f"a{i:03d}.bin",
    }


def email_fixture_attachment(i: int) -> bytes:
    return bytes((j * (i + 3) + i) % 256 for j in range(32 + i % 5))


def synth_email_table(n: int) -> pa.Table:
    from email.message import EmailMessage

    ids, raws = [], []
    for i in range(n):
        f = email_fixture_fields(i)
        m = EmailMessage()
        m["From"] = f["from"]
        m["To"] = f["to"]
        m["Subject"] = f["subject"]
        m["Date"] = f["date"]
        m.set_content(f["body"][:-1])
        m.add_attachment(
            email_fixture_attachment(i),
            maintype="application",
            subtype="octet-stream",
            filename=f["attachment_name"],
        )
        ids.append(f"m{i:05d}")
        raws.append(bytes(m))
    return pa.table(
        {
            "msg_id": pa.array(ids, pa.string()),
            "raw": pa.array(raws, pa.binary()),
        }
    )


# ---- graded HL7 fixture corpus ----------------------------------------


def hl7_fixture_message(i: int) -> str:
    """Deterministic HL7 v2 ADT message for fixture row ``i`` — every
    field a pure function of ``i`` so the graded hl7_parse oracle can
    recompute the parsed columns without splitting a segment."""
    return (
        f"MSH|^~\\&|APP{i % 7}|FAC{i % 3}|RCVAPP|RCVFAC|20231114221320||"
        f"ADT^A0{i % 4 + 1}|CID{i:05d}|P|2.5.1\r"
        f"PID|1||PAT{i:06d}||Name{i}^First{i}||19{70 + i % 30}0101|"
        f"{'MF'[i % 2]}\r"
        f"OBX|1|NM|HR||{60 + i % 40}|bpm\r"
    )


def synth_hl7_table(n: int) -> pa.Table:
    return pa.table(
        {
            "msg_id": pa.array([f"h{i:05d}" for i in range(n)], pa.string()),
            "message": pa.array(
                [hl7_fixture_message(i) for i in range(n)], pa.string()
            ),
        }
    )


# ---- graded MIME fixture corpus ---------------------------------------


def mime_fixture_payload(i: int) -> tuple[bytes, str]:
    """(payload, expected mime) for fixture row ``i`` — real container
    bytes where the format is cheap to render (gzip, zip), magic-prefix
    payloads elsewhere; the text kinds exercise the sniffer's xml/json/
    utf-8 fallbacks."""
    k = i % 8
    if k == 0:
        return b"\x89PNG\r\n\x1a\n" + bytes([i % 256]) * 16, "image/png"
    if k == 1:
        import gzip

        c = gzip.compress(f"doc {i}".encode(), mtime=0)
        return c, "application/gzip"
    if k == 2:
        import io
        import zipfile

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            info = zipfile.ZipInfo("a.txt", date_time=(1980, 1, 1, 0, 0, 0))
            z.writestr(info, f"x{i}")
        return buf.getvalue(), "application/zip"
    if k == 3:
        return f"<?xml version='1.0'?><r id='{i}'/>".encode(), "application/xml"
    if k == 4:
        return ('{"k": %d}' % i).encode(), "application/json"
    if k == 5:
        return f"plain text {i}".encode(), "text/plain"
    if k == 6:
        return b"\xfe\xff\xfa" + bytes((j * 7 + i) % 256 for j in range(16)), \
            "application/octet-stream"
    return b"%PDF-1.4\n" + f"{i}".encode(), "application/pdf"


def synth_mime_table(n: int) -> pa.Table:
    return pa.table(
        {
            "media_id": pa.array([f"b{i:05d}" for i in range(n)], pa.string()),
            "content": pa.array(
                [mime_fixture_payload(i)[0] for i in range(n)], pa.binary()
            ),
        }
    )
