"""Synchronous request/response web service — the HandleHttpRequest /
HandleHttpResponse + StandardHttpContextMap triple (reference
nifi-standard-processors/.../standard/HandleHttpRequest.java:508,609
registers each servlet exchange in an HttpContextMap under a context
identifier and stamps it on the flowfile as ``http.context.identifier``;
HandleHttpResponse.java:127-146 looks the exchange back up by that id
and writes the flowfile content as the HTTP response; an expired or
unknown context routes to failure and the held client gets a timeout
status).

``HttpContextServer`` is both edge processors and the context map in
one object, because the context map IS the server state here: each
incoming HTTP request is parked on a ``threading.Event`` (connection
held open), surfaced as one Arrow row carrying ``http_context_id``;
the pipeline computes responses however it likes (any Dataset chain —
the distributed middle is Ray's, only the park/complete edge is
node-local exactly like the reference's Jetty container), then
``respond()`` completes the parked exchanges by id. Requests
unanswered within ``request_expiration_s`` are released with **503
Service Unavailable** (HandleHttpRequest.java:395,616 uses 503 for
both queue-full and expired registrations).

At scale this edge is per-node (one context map per host in the
reference too — contexts are NOT cluster-shared); a load balancer
fronts N of them, and each node's pipeline drains its own pending set.
"""

from __future__ import annotations

import json
import threading
import time
import uuid

import pyarrow as pa

# framing / hop-by-hop response headers the server itself owns — user
# header maps are filtered against these before send_header (RFC 9110
# §7.6.1: hop-by-hop fields must not be forwarded)
_FRAMING_HEADERS = frozenset(
    {
        "content-length",
        "transfer-encoding",
        "connection",
        "keep-alive",
        "upgrade",
        "proxy-connection",
        "te",
        "trailer",
    }
)

REQUEST_SCHEMA = pa.schema(
    [
        ("http_context_id", pa.string()),
        ("method", pa.string()),
        ("path", pa.string()),
        ("query", pa.string()),
        ("headers_json", pa.string()),
        ("payload", pa.binary()),
        ("sender", pa.string()),
    ]
)


class _Pending:
    __slots__ = ("row", "event", "status", "body", "headers", "deadline", "taken")

    def __init__(self, row: dict, deadline: float):
        self.row = row
        self.event = threading.Event()
        self.status: int | None = None
        self.body: bytes = b""
        self.headers: dict = {}
        self.deadline = deadline
        self.taken = False  # handed to the pipeline at least once


class HttpContextServer:
    """Threaded HTTP edge: park requests, surface them as Arrow rows,
    complete them by context id. Use as a context manager."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 0,
        request_expiration_s: float = 30.0,
        max_pending: int = 1024,
        max_body: int = 16 << 20,
    ):
        import http.server
        import socketserver

        self.exp = request_expiration_s
        self.max_pending = max_pending
        self._lock = threading.Lock()
        self._pending: dict[str, _Pending] = {}
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def _handle(self):
                n = int(self.headers.get("Content-Length", 0) or 0)
                if n > max_body:
                    self.send_error(413)
                    return
                body = self.rfile.read(n) if n else b""
                ctx = str(uuid.uuid4())
                path, _, query = self.path.partition("?")
                row = {
                    "http_context_id": ctx,
                    "method": self.command,
                    "path": path,
                    "query": query,
                    "headers_json": json.dumps(dict(self.headers), sort_keys=True),
                    "payload": body,
                    "sender": self.client_address[0],
                }
                p = _Pending(row, time.monotonic() + outer.exp)
                with outer._lock:
                    if len(outer._pending) >= outer.max_pending:
                        # destination queue full → 503 (HandleHttpRequest.java:395)
                        self.send_error(503, explain="pending queue full")
                        return
                    outer._pending[ctx] = p
                ok = p.event.wait(timeout=max(0.0, p.deadline - time.monotonic()))
                with outer._lock:
                    outer._pending.pop(ctx, None)
                    # a respond() racing the expiration window completes
                    # the exchange under the lock BEFORE this pop — honor
                    # it (connection is still open) so its 'completed'
                    # count never lies about a client who actually got 503
                    ok = ok or p.event.is_set()
                if not ok:
                    # expired registration → 503 (HandleHttpRequest.java:616)
                    self.send_error(503, explain="request expired")
                    return
                payload = p.body or b""
                self.send_response(p.status)
                for k, v in p.headers.items():
                    # the server owns message framing: a user-supplied
                    # Content-Length/Transfer-Encoding/Connection header
                    # would duplicate or conflict with the ones emitted
                    # below (hop-by-hop headers are never forwarded)
                    if k.lower() in _FRAMING_HEADERS:
                        continue
                    self.send_header(k, v)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            do_GET = do_POST = do_PUT = do_DELETE = do_HEAD = _handle
            do_PATCH = _handle

            def log_message(self, *a):  # quiet
                pass

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self.server = Server((host, port), Handler)
        self._thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self._thread.start()

    @property
    def port(self) -> int:
        return self.server.server_address[1]

    def pending(self, min_rows: int = 1, timeout: float = 5.0) -> pa.Table:
        """Snapshot of parked, not-yet-handed-out requests as one Arrow
        table (HandleHttpRequest's onTrigger drain). Blocks until at
        least ``min_rows`` fresh requests are parked or ``timeout``
        passes; each request is handed out once (re-drains return only
        new arrivals, so a looped server never double-processes)."""
        t0 = time.monotonic()
        while True:
            with self._lock:
                fresh = [p for p in self._pending.values() if not p.taken]
                if len(fresh) >= min_rows or time.monotonic() - t0 >= timeout:
                    for p in fresh:
                        p.taken = True
                    rows = [p.row for p in fresh]
                    break
            time.sleep(0.005)
        cols = {f.name: [r[f.name] for r in rows] for f in REQUEST_SCHEMA}
        return pa.table(cols, schema=REQUEST_SCHEMA)

    def respond(
        self,
        table: pa.Table,
        status_col: str = "status_code",
        body_col: str = "response_body",
        id_col: str = "http_context_id",
        headers_col: str | None = None,
    ) -> dict:
        """HandleHttpResponse: complete each row's parked exchange.
        Returns ``{completed, missing}`` — ``missing`` counts ids whose
        context already expired or never existed (the reference routes
        those flowfiles to failure, HandleHttpResponse.java:142-146)."""
        completed = missing = 0
        ids = table[id_col].to_pylist()
        stats = table[status_col].to_pylist()
        bodies = (
            table[body_col].to_pylist()
            if body_col in table.column_names
            else [b""] * table.num_rows
        )
        hdrs = (
            table[headers_col].to_pylist()
            if headers_col and headers_col in table.column_names
            else [None] * table.num_rows
        )
        for ctx, status, body, hd in zip(ids, stats, bodies, hdrs):
            # mutate + signal INSIDE the lock: the handler pops expired
            # contexts under the same lock, so an exchange is either
            # completed-before-pop (handler honors it via event.is_set)
            # or already popped (counted missing) — never counted
            # completed while the client actually received 503
            with self._lock:
                p = self._pending.get(ctx)
                if p is None:
                    missing += 1
                    continue
                p.status = int(status)
                p.body = (
                    body.encode() if isinstance(body, str) else bytes(body or b"")
                )
                if hd:
                    p.headers = json.loads(hd) if isinstance(hd, str) else dict(hd)
                p.event.set()
            completed += 1
        return {"completed": completed, "missing": missing}

    def close(self):
        self.server.shutdown()
        self.server.server_close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
