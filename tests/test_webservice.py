"""HandleHttpRequest/HandleHttpResponse request-response web service:
clients hold connections open while a Ray pipeline computes the
responses; expiration and unknown-context routing per the reference."""

import http.client
import threading

import pyarrow as pa
import pytest

from nifi_ray.sources.webservice import HttpContextServer


def _post(port, path, body, results, i, timeout=15):
    c = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    c.request("POST", path, body=body)
    r = c.getresponse()
    results[i] = (r.status, r.read())
    c.close()


def test_request_response_through_ray_pipeline(ray_session):
    import ray.data

    with HttpContextServer() as srv:
        results = [None] * 3
        ts = [
            threading.Thread(
                target=_post, args=(srv.port, f"/echo/{i}", f"msg {i}".encode(), results, i)
            )
            for i in range(3)
        ]
        [t.start() for t in ts]
        req = srv.pending(min_rows=3, timeout=10.0)
        assert req.num_rows == 3
        assert set(req["method"].to_pylist()) == {"POST"}

        # the distributed middle: any Dataset chain computes the response
        def upper(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            body = pc.binary_join_element_wise(
                pc.cast(batch["payload"], pa.string()), " OK", ""
            )
            return batch.append_column(
                "response_body", pc.cast(pc.utf8_upper(body), pa.binary())
            ).append_column(
                "status_code", pa.array([200] * batch.num_rows, pa.int32())
            )

        resp = (
            ray.data.from_arrow(req)
            .map_batches(upper, batch_format="pyarrow")
            .take_all()
        )
        out = srv.respond(pa.Table.from_pylist(resp))
        assert out == {"completed": 3, "missing": 0}
        [t.join(timeout=10) for t in ts]
    assert sorted(results) == [(200, b"MSG 0 OK"), (200, b"MSG 1 OK"), (200, b"MSG 2 OK")]


def test_unanswered_request_expires_503():
    with HttpContextServer(request_expiration_s=0.3) as srv:
        results = [None]
        t = threading.Thread(target=_post, args=(srv.port, "/x", b"b", results, 0))
        t.start()
        req = srv.pending(min_rows=1, timeout=5.0)
        assert req.num_rows == 1  # handed out but never answered
        t.join(timeout=10)
    assert results[0][0] == 503  # expired registration → 503


def test_respond_unknown_context_counts_missing():
    with HttpContextServer() as srv:
        tbl = pa.table(
            {
                "http_context_id": ["nope"],
                "status_code": [200],
                "response_body": [b"x"],
            }
        )
        assert srv.respond(tbl) == {"completed": 0, "missing": 1}


def test_redrain_returns_only_new_arrivals():
    with HttpContextServer() as srv:
        results = [None] * 2
        t0 = threading.Thread(target=_post, args=(srv.port, "/a", b"1", results, 0))
        t0.start()
        first = srv.pending(min_rows=1, timeout=5.0)
        assert first.num_rows == 1
        t1 = threading.Thread(target=_post, args=(srv.port, "/b", b"2", results, 1))
        t1.start()
        second = srv.pending(min_rows=1, timeout=5.0)
        assert second.num_rows == 1
        assert second["path"][0].as_py() == "/b"  # /a not re-handed
        for tbl in (first, second):
            srv.respond(
                tbl.append_column(
                    "status_code", pa.array([201] * tbl.num_rows, pa.int32())
                ).append_column(
                    "response_body", pa.array([b"ok"] * tbl.num_rows, pa.binary())
                )
            )
        t0.join(timeout=10), t1.join(timeout=10)
    assert [r[0] for r in results] == [201, 201]


def test_custom_headers_roundtrip():
    import json

    with HttpContextServer() as srv:
        results = [None]

        def get(port, results):
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=15)
            c.request("GET", "/h")
            r = c.getresponse()
            results[0] = (r.status, r.getheader("X-Custom"), r.read())
            c.close()

        t = threading.Thread(target=get, args=(srv.port, results))
        t.start()
        req = srv.pending(min_rows=1, timeout=5.0)
        resp = req.append_column(
            "status_code", pa.array([200], pa.int32())
        ).append_column("response_body", pa.array([b"hdr"], pa.binary())).append_column(
            "resp_headers", pa.array([json.dumps({"X-Custom": "yes"})], pa.string())
        )
        srv.respond(resp, headers_col="resp_headers")
        t.join(timeout=10)
    assert results[0] == (200, "yes", b"hdr")
