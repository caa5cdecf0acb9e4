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
