"""FTP list/fetch source — GetFTP / ListFTP / FetchFTP analogs.

Reference semantics (nifi-standard-processors/.../standard/ListFTP.java,
FetchFTP.java, GetFTP.java via FTPTransfer.java): LIST the remote dir
with the same mtime-watermark + same-timestamp-id-set checkpoint as
ListFile (AbstractListProcessor.java:148-316 — shared with
`sources/listing.py` here), then FETCH each surfaced path over its own
connection. The reference keeps one FTPClient per processor; here the
fetch is an actor-pool ``map_batches`` stage — one ftplib connection
per actor built in ``__init__``, one RETR per row, errors routed to a
column (never raised) so one dead path can't kill a 100 TB block retry.

The listing runs on the DRIVER (cheap metadata walk, exactly like
ListFile) and commits its checkpoint only when told — NiFi's
commit-after-session ordering.

``MiniFtpServer`` is a loopback test fixture: a read-only RFC 959
subset (USER/PASS/TYPE/PASV/NLST/LIST/MDTM/SIZE/RETR) on stdlib
sockets, enough for ftplib — no third-party server dependency, same
spirit as the real-socket listeners in ``sources/listen.py``.
"""

from __future__ import annotations

import os
import posixpath
import socket
import socketserver
import threading
from datetime import datetime, timezone

import pyarrow as pa

from .listing import ListingState

# --------------------------------------------------------------- listing


def list_ftp(
    host: str,
    port: int,
    remote_dir: str,
    state_path: str,
    user: str = "anonymous",
    password: str = "",
    commit: bool = True,
) -> list[str]:
    """Remote paths in ``remote_dir`` not yet listed (MDTM watermark +
    same-mtime dedup set, ListFile.java's contract over FTP), advancing
    the checkpoint unless ``commit=False``."""
    import ftplib

    st = ListingState.load(state_path)
    ftp = ftplib.FTP()
    ftp.connect(host, port, timeout=30)
    ftp.login(user, password)
    try:
        names = ftp.nlst(remote_dir)
        entries = []
        for n in sorted(names):
            full = n if n.startswith("/") or "/" in n else posixpath.join(remote_dir, n)
            resp = ftp.voidcmd(f"MDTM {full}")  # "213 YYYYMMDDHHMMSS"
            ts = (
                datetime.strptime(resp[4:18], "%Y%m%d%H%M%S")
                .replace(tzinfo=timezone.utc)
                .timestamp()
            )
            entries.append((full, ts))
    finally:
        ftp.quit()

    new: list[str] = []
    max_ts = st.listed_timestamp
    for full, mtime in entries:
        if mtime < st.listed_timestamp:
            continue
        if mtime == st.listed_timestamp and full in st.ids_at_timestamp:
            continue
        new.append(full)
        max_ts = max(max_ts, mtime)

    if commit and new:
        ids_at_max = [f for f, m in entries if m == max_ts]
        ListingState(max_ts, ids_at_max).save(state_path)
    return new


# ----------------------------------------------------------------- fetch


class FtpFetch:
    """Actor-pool stage: RETR the remote path in ``path_col`` per row;
    appends ``content`` (binary, null on failure) and ``error``
    (string). One control connection per actor, lazily reconnected
    after a transport error."""

    def __init__(
        self,
        host: str,
        port: int,
        path_col: str = "path",
        user: str = "anonymous",
        password: str = "",
        timeout: float = 30.0,
        max_bytes: int = 64 << 20,
    ):
        self.host, self.port = host, port
        self.user, self.password = user, password
        self.path_col, self.timeout, self.max_bytes = path_col, timeout, max_bytes
        self._ftp = None
        self._connect()

    def _connect(self):
        import ftplib

        self._ftp = ftplib.FTP()
        self._ftp.connect(self.host, self.port, timeout=self.timeout)
        self._ftp.login(self.user, self.password)

    def _one(self, path: str | None):
        if not path:
            return None, "empty path"
        buf, total = [], 0

        def sink(chunk: bytes):
            nonlocal total
            total += len(chunk)
            if total > self.max_bytes:
                raise OSError(f"exceeds max_bytes={self.max_bytes}")
            buf.append(chunk)

        for attempt in (0, 1):  # one reconnect on a dead control channel
            try:
                self._ftp.retrbinary(f"RETR {path}", sink)
                return b"".join(buf), None
            except (OSError, EOFError) as e:
                buf.clear()
                total = 0
                if attempt == 0:
                    try:
                        self._connect()
                        continue
                    except Exception as e2:  # noqa: BLE001
                        return None, f"reconnect failed: {e2}"
                return None, f"{type(e).__name__}: {e}"
            except Exception as e:  # noqa: BLE001 — e.g. 550 missing file
                return None, f"{type(e).__name__}: {e}"

    def __call__(self, batch: pa.Table) -> pa.Table:
        contents, errors = [], []
        for p in batch[self.path_col].to_pylist():
            c, err = self._one(p)
            contents.append(c)
            errors.append(err)
        return batch.append_column(
            "content", pa.array(contents, pa.binary())
        ).append_column("error", pa.array(errors, pa.string()))


class FtpPut:
    """Actor-pool egress stage (PutFTP, reference
    nifi-standard-processors/.../standard/PutFTP.java via
    FTPTransfer.java): upload each row's ``content`` to
    ``path_col`` using the reference's DOT-RENAME two-phase commit —
    STOR to ``.name`` then rename to ``name`` once the transfer
    completed, so a reader never lists a half-written file. One control
    connection per actor; failures go to an ``error`` column."""

    def __init__(
        self,
        host: str,
        port: int,
        path_col: str = "path",
        content_col: str = "content",
        user: str = "anonymous",
        password: str = "",
        timeout: float = 30.0,
    ):
        self.host, self.port = host, port
        self.user, self.password = user, password
        self.path_col, self.content_col, self.timeout = path_col, content_col, timeout
        self._connect()

    def _connect(self):
        import ftplib

        self._ftp = ftplib.FTP()
        self._ftp.connect(self.host, self.port, timeout=self.timeout)
        self._ftp.login(self.user, self.password)

    def _one(self, path: str | None, content: bytes | None):
        import io

        if not path or content is None:
            return "empty path or content"
        d, _, name = path.rpartition("/")
        tmp = f"{d}/.{name}" if d else f".{name}"
        for attempt in (0, 1):
            try:
                self._ftp.storbinary(f"STOR {tmp}", io.BytesIO(content))
                self._ftp.rename(tmp, path)
                return None
            except (OSError, EOFError) as e:
                if attempt == 0:
                    try:
                        self._connect()
                        continue
                    except Exception as e2:  # noqa: BLE001
                        return f"reconnect failed: {e2}"
                return f"{type(e).__name__}: {e}"
            except Exception as e:  # noqa: BLE001
                return f"{type(e).__name__}: {e}"

    def __call__(self, batch: pa.Table) -> pa.Table:
        errs = [
            self._one(p, c)
            for p, c in zip(
                batch[self.path_col].to_pylist(), batch[self.content_col].to_pylist()
            )
        ]
        return batch.append_column("error", pa.array(errs, pa.string()))


# ---------------------------------------------------- loopback test server


class _FtpHandler(socketserver.StreamRequestHandler):
    def _reply(self, line: str):
        self.wfile.write((line + "\r\n").encode())

    def _resolve(self, arg: str) -> str:
        p = arg.lstrip("/")
        full = os.path.normpath(os.path.join(self.server.root_dir, p))
        if not full.startswith(os.path.abspath(self.server.root_dir)):
            raise PermissionError(arg)
        return full

    def _open_data(self):
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        s.listen(1)
        self._pasv = s
        port = s.getsockname()[1]
        self._reply(f"227 Entering Passive Mode (127,0,0,1,{port >> 8},{port & 255})")

    def _send_data(self, payload: bytes):
        conn, _ = self._pasv.accept()
        try:
            conn.sendall(payload)
        finally:
            conn.close()
            self._pasv.close()
            self._pasv = None

    def handle(self):
        self._pasv = None
        self._rnfr = None
        self._reply("220 mini ftp ready")
        cwd = "/"
        while True:
            raw = self.rfile.readline()
            if not raw:
                return
            line = raw.decode(errors="replace").strip()
            cmd, _, arg = line.partition(" ")
            cmd = cmd.upper()
            try:
                if cmd == "USER":
                    self._reply("331 any password")
                elif cmd == "PASS":
                    self._reply("230 logged in")
                elif cmd in ("SYST",):
                    self._reply("215 UNIX Type: L8")
                elif cmd == "TYPE":
                    self._reply("200 ok")
                elif cmd == "PWD":
                    self._reply(f'257 "{cwd}"')
                elif cmd == "CWD":
                    cwd = arg or "/"
                    self._reply("250 ok")
                elif cmd == "PASV":
                    self._open_data()
                elif cmd in ("NLST", "LIST"):
                    d = self._resolve(arg or cwd)
                    names = sorted(
                        n for n in os.listdir(d) if not n.startswith(".")
                    )
                    if cmd == "LIST":
                        lines = [
                            f"-rw-r--r-- 1 ftp ftp {os.path.getsize(os.path.join(d, n))} Jan  1 00:00 {n}"
                            for n in names
                        ]
                    else:
                        pre = (arg or cwd).rstrip("/")
                        lines = [f"{pre}/{n}" if pre else n for n in names]
                    self._reply("150 listing")
                    self._send_data("".join(f"{ln}\r\n" for ln in lines).encode())
                    self._reply("226 done")
                elif cmd == "MDTM":
                    full = self._resolve(arg)
                    ts = datetime.fromtimestamp(os.stat(full).st_mtime, timezone.utc)
                    self._reply(f"213 {ts.strftime('%Y%m%d%H%M%S')}")
                elif cmd == "SIZE":
                    self._reply(f"213 {os.path.getsize(self._resolve(arg))}")
                elif cmd == "RETR":
                    with open(self._resolve(arg), "rb") as f:
                        payload = f.read()
                    self._reply("150 sending")
                    self._send_data(payload)
                    self._reply("226 done")
                elif cmd == "STOR":
                    full = self._resolve(arg)
                    self._reply("150 receiving")
                    conn, _ = self._pasv.accept()
                    try:
                        with open(full, "wb") as f:
                            while True:
                                chunk = conn.recv(65536)
                                if not chunk:
                                    break
                                f.write(chunk)
                    finally:
                        conn.close()
                        self._pasv.close()
                        self._pasv = None
                    self._reply("226 stored")
                elif cmd == "RNFR":
                    self._rnfr = self._resolve(arg)
                    self._reply("350 ready")
                elif cmd == "RNTO":
                    os.replace(self._rnfr, self._resolve(arg))
                    self._rnfr = None
                    self._reply("250 renamed")
                elif cmd == "DELE":
                    os.remove(self._resolve(arg))
                    self._reply("250 deleted")
                elif cmd == "QUIT":
                    self._reply("221 bye")
                    return
                else:
                    self._reply("502 not implemented")
            except (OSError, PermissionError) as e:
                if self._pasv is not None:
                    self._pasv.close()
                    self._pasv = None
                self._reply(f"550 {type(e).__name__}: {e}")


class MiniFtpServer:
    """Read-only loopback FTP server over ``root_dir`` (test fixture).

        with MiniFtpServer(tmp) as srv:
            list_ftp("127.0.0.1", srv.port, "/", state)
    """

    def __init__(self, root_dir: str):
        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server(("127.0.0.1", 0), _FtpHandler)
        self._server.root_dir = os.path.abspath(root_dir)
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def close(self):
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---- graded fixture corpus ------------------------------------------


def ftp_fixture_content(i: int) -> bytes:
    """Deterministic payload for fixture file ``i`` — a pure function
    shared by the graded ftp_roundtrip query (which writes it into the
    loopback server root) and its expected-oracle builder (which never
    touches FTP), so listing + RETR + digest are pinned end-to-end."""
    import numpy as np

    n = 100 + i * 7
    return ((np.arange(n, dtype=np.int64) * (i + 1) + i) % 256).astype(
        "uint8"
    ).tobytes()


def write_ftp_fixture(root_dir: str, n_files: int = 24) -> list[str]:
    """Materialize the fixture corpus under ``root_dir``; returns the
    server-absolute paths in name order."""
    paths = []
    for i in range(n_files):
        name = f"f{i:03d}.bin"
        with open(os.path.join(root_dir, name), "wb") as f:
            f.write(ftp_fixture_content(i))
        paths.append(f"/{name}")
    return paths
