"""HTTP client stages — InvokeHTTP / GetHTTP / PostHTTP analogs
(reference nifi-standard-processors/src/main/java/org/apache/nifi/
processors/standard/InvokeHTTP.java, GetHTTP.java, PostHTTP.java).

``HttpFetch`` is an actor-pool map_batches stage: one request per row
(one request per flowfile in the reference too — the parallelism axis
is the pool, ``concurrency=N`` actors each holding its own opener),
writing status/body/error columns so responses route downstream exactly
like InvokeHTTP's Response/Retry/No-Retry relationships: a
``RouTer``-style predicate over ``status_code`` (stages/route.py).

Per-row network I/O is inherent to the operator; what must NOT be
per-row is connection setup — the opener is built once per actor in
``__init__``. Failures never raise: a dead endpoint yields
``status_code = -1`` + ``error`` text, because at 100 TB a transform
that throws on one bad URL kills a whole block retry, not one record.
"""

from __future__ import annotations

import pyarrow as pa


class HttpFetch:
    """Actor-pool stage: GET (or POST when ``body_col`` is set) the URL
    in ``url_col`` per row; appends ``status_code`` (int32, -1 on
    transport error), ``response_body`` (binary), ``error`` (string)."""

    def __init__(
        self,
        url_col: str = "url",
        body_col: str | None = None,
        timeout: float = 10.0,
        max_bytes: int = 16 << 20,
    ):
        import urllib.request

        self.url_col, self.body_col = url_col, body_col
        self.timeout, self.max_bytes = timeout, max_bytes
        self.opener = urllib.request.build_opener()  # once per actor

    def _one(self, url: str | None, body: bytes | None):
        import urllib.error
        import urllib.request

        if not url:
            return -1, None, "empty url"
        try:
            req = urllib.request.Request(url, data=body)
            with self.opener.open(req, timeout=self.timeout) as resp:
                return resp.status, resp.read(self.max_bytes), None
        except urllib.error.HTTPError as e:  # non-2xx still has a status
            return e.code, e.read(self.max_bytes) if e.fp else b"", None
        except Exception as e:  # noqa: BLE001 — record-level routing
            return -1, None, f"{type(e).__name__}: {e}"

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch[self.url_col].to_pylist()
        bodies = (
            batch[self.body_col].to_pylist()
            if self.body_col is not None
            else [None] * len(urls)
        )
        status, resp, err = [], [], []
        for u, b in zip(urls, bodies):
            if isinstance(b, str):
                b = b.encode()
            s, r, e = self._one(u, b)
            status.append(s), resp.append(r), err.append(e)
        return (
            batch.append_column("status_code", pa.array(status, pa.int32()))
            .append_column("response_body", pa.array(resp, pa.binary()))
            .append_column("error", pa.array(err, pa.string()))
        )


class HttpPut:
    """Actor-pool PUSH egress — the PostHTTP analog (reference
    nifi-standard-processors/.../standard/PostHTTP.java:1020 onSuccess
    commits the session only AFTER the server's 2xx acknowledgment;
    TestPostHTTP.java pins retry-on-5xx semantics).

    Per row: POST ``content_col`` to ``url`` (a fixed endpoint or a
    per-row ``url_col``). Transport errors and 5xx responses are retried
    with exponential backoff up to ``max_retries`` (the reference routes
    to `retry` and redelivers; a bounded in-stage retry is the batch
    analog — what still fails is routed, never raised). 4xx is routed to
    failure immediately (reference: non-retryable). Each attempt carries
    a deterministic ``X-Idempotency-Key`` (md5 of the content) so a
    redelivered row is server-side dedupable — ack-after-success with
    at-least-once delivery, the same contract as the FTP dot-rename and
    Kafka commit-after-session sinks.

    Output columns: ``status_code`` (int32 final attempt, -1 transport),
    ``attempts`` (int32), ``error`` (string | null on success).
    """

    def __init__(
        self,
        url: str | None = None,
        url_col: str | None = None,
        content_col: str = "content",
        content_type: str = "application/octet-stream",
        timeout: float = 10.0,
        max_retries: int = 3,
        backoff_s: float = 0.05,
        headers: dict | None = None,
    ):
        import urllib.request

        if (url is None) == (url_col is None):
            raise ValueError("exactly one of url / url_col is required")
        self.url, self.url_col, self.content_col = url, url_col, content_col
        self.content_type, self.timeout = content_type, timeout
        self.max_retries, self.backoff_s = max_retries, backoff_s
        self.headers = dict(headers or {})
        self.opener = urllib.request.build_opener()  # once per actor

    def _one(self, url: str | None, content) -> tuple[int, int, str | None]:
        import hashlib
        import time
        import urllib.error
        import urllib.request

        if not url or content is None:
            return -1, 0, "empty url or content"
        body = content.encode() if isinstance(content, str) else bytes(content)
        idem = hashlib.md5(body).hexdigest()
        last_err: str | None = None
        status = -1
        for attempt in range(1, self.max_retries + 2):
            try:
                req = urllib.request.Request(url, data=body, method="POST")
                req.add_header("Content-Type", self.content_type)
                req.add_header("X-Idempotency-Key", idem)
                for k, v in self.headers.items():
                    req.add_header(k, v)
                with self.opener.open(req, timeout=self.timeout) as resp:
                    return resp.status, attempt, None
            except urllib.error.HTTPError as e:
                status = e.code
                if 400 <= e.code < 500:  # non-retryable (reference: failure)
                    return e.code, attempt, f"HTTP {e.code}"
                last_err = f"HTTP {e.code}"
            except Exception as e:  # noqa: BLE001 — transport: retryable
                status, last_err = -1, f"{type(e).__name__}: {e}"
            if attempt <= self.max_retries:
                time.sleep(self.backoff_s * (2 ** (attempt - 1)))
        return status, self.max_retries + 1, last_err

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = (
            batch[self.url_col].to_pylist()
            if self.url_col
            else [self.url] * batch.num_rows
        )
        contents = batch[self.content_col].to_pylist()
        status, attempts, errs = [], [], []
        for u, c in zip(urls, contents):
            s, a, e = self._one(u, c)
            status.append(s), attempts.append(a), errs.append(e)
        return (
            batch.append_column("status_code", pa.array(status, pa.int32()))
            .append_column("attempts", pa.array(attempts, pa.int32()))
            .append_column("error", pa.array(errs, pa.string()))
        )


class BulkRecordPut:
    """Bulk record egress — the PutElasticsearchHttp analog (reference
    nifi-elasticsearch-bundle/nifi-elasticsearch-processors/src/main/java/
    org/apache/nifi/processors/elasticsearch/PutElasticsearchHttp.java:219
    builds ONE ``_bulk`` NDJSON request per batch of records; :334-349
    walks the response's per-item ``status`` array and routes every record
    success/failure independently; PutSQS.java batches the same way).

    Rows are serialized as NDJSON action+source line pairs and POSTed in
    chunks of ``batch_records`` — one request per chunk, not per record:
    ``HttpPut`` is for payloads that ARE whole documents; record streams
    must amortize the round-trip (at 100 TB a per-record POST is 10^10
    requests). Whole-request 5xx/transport failures retry with backoff
    like ``HttpPut``; rows of a chunk that still fails all carry
    ``status_code = -1`` (reference: whole flowfile → retry). A 2xx
    response is parsed for per-item statuses: rows whose item status is
    >= 300 carry that status plus the server's reason in ``error``
    (reference: those records route to failure, the rest to success).

    Output columns: ``status_code`` (int32 per record), ``error``
    (string | null), ``requests`` (int32 — HTTP requests this row's
    chunk needed, for retry observability).
    """

    def __init__(
        self,
        url: str,
        id_col: str = "doc_id",
        index: str = "docs",
        op: str = "index",
        content_cols: list[str] | None = None,
        batch_records: int = 500,
        timeout: float = 10.0,
        max_retries: int = 3,
        backoff_s: float = 0.05,
        headers: dict | None = None,
    ):
        import urllib.request

        if op not in ("index", "create", "update", "delete"):
            raise ValueError(f"unsupported bulk op: {op}")
        self.url = url.rstrip("/") + "/_bulk"
        self.id_col, self.index, self.op = id_col, index, op
        self.content_cols = list(content_cols) if content_cols else None
        self.batch_records = int(batch_records)
        self.timeout, self.max_retries = timeout, max_retries
        self.backoff_s, self.headers = backoff_s, dict(headers or {})
        self.opener = urllib.request.build_opener()  # once per actor

    # ---------------------------------------------------------- request
    def _post(self, body: bytes) -> tuple[int, bytes | None, str | None, int]:
        """POST one bulk body; returns (status, resp_bytes, err, requests).
        Retries whole-request 5xx/transport with exponential backoff."""
        import time
        import urllib.error
        import urllib.request

        last_err: str | None = None
        status = -1
        for attempt in range(1, self.max_retries + 2):
            try:
                req = urllib.request.Request(self.url, data=body, method="POST")
                req.add_header("Content-Type", "application/x-ndjson")
                for k, v in self.headers.items():
                    req.add_header(k, v)
                with self.opener.open(req, timeout=self.timeout) as resp:
                    return resp.status, resp.read(), None, attempt
            except urllib.error.HTTPError as e:
                status = e.code
                if 400 <= e.code < 500:  # non-retryable whole-request
                    return e.code, None, f"HTTP {e.code}", attempt
                last_err = f"HTTP {e.code}"
            except Exception as e:  # noqa: BLE001 — transport: retryable
                status, last_err = -1, f"{type(e).__name__}: {e}"
            if attempt <= self.max_retries:
                time.sleep(self.backoff_s * (2 ** (attempt - 1)))
        return status, None, last_err, self.max_retries + 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        cols = self.content_cols or [
            c for c in batch.column_names if c != self.id_col
        ]
        ids = batch[self.id_col].to_pylist()
        sources = batch.select(cols).to_pylist()
        n = batch.num_rows
        status = [0] * n
        errs: list[str | None] = [None] * n
        reqs = [0] * n
        for lo in range(0, n, self.batch_records):
            hi = min(lo + self.batch_records, n)
            lines = []
            for i in range(lo, hi):
                lines.append(json.dumps(
                    {self.op: {"_index": self.index, "_id": str(ids[i])}},
                    separators=(",", ":")))
                if self.op != "delete":
                    lines.append(json.dumps(
                        sources[i], separators=(",", ":"), default=str))
            body = ("\n".join(lines) + "\n").encode()
            http_status, resp, err, attempts = self._post(body)
            for i in range(lo, hi):
                reqs[i] = attempts
            if err is not None or resp is None:
                for i in range(lo, hi):  # whole chunk → retry relationship
                    status[i], errs[i] = http_status, err or "empty response"
                continue
            try:
                items = json.loads(resp)["items"]
                if len(items) != hi - lo:
                    raise ValueError(
                        f"bulk response has {len(items)} items for "
                        f"{hi - lo} records")
            except Exception as e:  # noqa: BLE001 — malformed response
                for i in range(lo, hi):
                    status[i], errs[i] = -1, f"bad bulk response: {e}"
                continue
            for i, item in zip(range(lo, hi), items):
                d = item.get(self.op) or next(iter(item.values()), {})
                st = int(d.get("status", -1))
                status[i] = st
                if st >= 300:
                    reason = d.get("error") or {}
                    errs[i] = (
                        reason.get("reason", str(reason))
                        if isinstance(reason, dict) else str(reason))
        return (
            batch.append_column("status_code", pa.array(status, pa.int32()))
            .append_column("error", pa.array(errs, pa.string()))
            .append_column("requests", pa.array(reqs, pa.int32()))
        )


# ---- graded fixture corpus ------------------------------------------


def http_fixture_content(i: int) -> bytes:
    """Deterministic payload for fixture path ``/p{i:03d}`` — a pure
    function shared by the graded http_fetch query (served by
    FixtureHttpServer) and its expected-oracle builder (which never
    makes a request)."""
    n = 64 + (i * 13) % 100
    return bytes((j * (i + 7) + 3 * i) % 256 for j in range(n))


class FixtureHttpServer:
    """Loopback HTTP server for the graded http_fetch query: serves
    ``/pNNN`` from ``http_fixture_content``, 404 elsewhere."""

    def __init__(self):
        import http.server
        import re
        import threading

        class H(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                m = re.fullmatch(r"/p(\d{3})", self.path)
                if not m:
                    self.send_error(404)
                    return
                body = http_fixture_content(int(m.group(1)))
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # noqa: D102 — quiet fixture
                pass

        class Srv(http.server.ThreadingHTTPServer):
            daemon_threads = True

        self._srv = Srv(("127.0.0.1", 0), H)
        self._thread = threading.Thread(
            target=self._srv.serve_forever, daemon=True
        )
        self._thread.start()

    @property
    def port(self) -> int:
        return self._srv.server_address[1]

    def close(self):
        self._srv.shutdown()
        self._srv.server_close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
