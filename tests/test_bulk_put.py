"""BulkRecordPut — PutElasticsearchHttp-analog bulk egress (reference
nifi-elasticsearch-processors/.../PutElasticsearchHttp.java:219,334-349;
TestPutElasticsearchHttp.java pins per-item failure routing)."""

import http.server
import json
import socketserver
import threading

import pytest
import ray

from nifi_ray.stages.http import BulkRecordPut


@pytest.fixture()
def bulk_server():
    """Minimal _bulk endpoint: NDJSON in, per-item statuses out.
    Ids containing 'bad' fail per-item with 404; the first request
    overall is rejected 503 to exercise whole-request retry."""
    state = {"requests": 0, "bodies": []}

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            state["requests"] += 1
            state["bodies"].append(body)
            if state["requests"] == 1:
                self.send_response(503)
                self.end_headers()
                return
            lines = body.decode().splitlines()
            items = []
            i = 0
            while i < len(lines):
                action = json.loads(lines[i])
                op, meta = next(iter(action.items()))
                i += 1 if op == "delete" else 2
                if "bad" in meta["_id"]:
                    items.append({op: {"status": 404, "error": {
                        "reason": "no such doc"}}})
                else:
                    items.append({op: {"status": 201}})
            resp = json.dumps({"errors": any(
                next(iter(it.values()))["status"] >= 300 for it in items),
                "items": items}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

        def log_message(self, *a):
            pass

    class Srv(socketserver.ThreadingMixIn, http.server.HTTPServer):
        daemon_threads = True

    srv = Srv(("127.0.0.1", 0), H)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}", state
    finally:
        srv.shutdown()
        srv.server_close()


def test_bulk_put_per_item_routing_and_whole_request_retry(
    ray_session, bulk_server
):
    url, state = bulk_server
    rows = [
        {"doc_id": f"d{i}" if i != 2 else "bad2", "tokens": [i, i + 1],
         "source": "s"}
        for i in range(5)
    ]
    out = {
        r["doc_id"]: r
        for r in ray.data.from_items(rows)
        .map_batches(
            BulkRecordPut(url, batch_records=3, max_retries=2,
                          backoff_s=0.01),
            batch_format="pyarrow", concurrency=1, batch_size=5,
        )
        .take_all()
    }
    # chunk 1 (3 records) hits the injected 503 then succeeds → 2 requests;
    # chunk 2 needed 1. Whole-request retry never raises.
    assert out["d0"]["requests"] == 2 and out["d3"]["requests"] == 1
    # per-item routing: bad2 fails with the server's status+reason, the
    # other records of the SAME chunk succeed
    assert out["bad2"]["status_code"] == 404
    assert out["bad2"]["error"] == "no such doc"
    for k in ("d0", "d1", "d3", "d4"):
        assert out[k]["status_code"] == 201 and out[k]["error"] is None
    # NDJSON framing: action line + source line per record, ids stringified
    first_ok_body = state["bodies"][1].decode().splitlines()
    assert json.loads(first_ok_body[0]) == {
        "index": {"_index": "docs", "_id": "d0"}}
    src = json.loads(first_ok_body[1])
    assert src == {"tokens": [0, 1], "source": "s"}


def test_bulk_put_delete_op_has_no_source_line(ray_session, bulk_server):
    url, state = bulk_server
    state["requests"] = 1  # skip the injected 503
    rows = [{"doc_id": "d9", "tokens": [1]}]
    out = (
        ray.data.from_items(rows)
        .map_batches(
            BulkRecordPut(url, op="delete", backoff_s=0.01),
            batch_format="pyarrow", concurrency=1,
        )
        .take_all()
    )
    assert out[0]["status_code"] == 201
    body = state["bodies"][-1].decode().splitlines()
    assert len(body) == 1 and "delete" in body[0]


def test_bulk_put_dead_endpoint_routes_whole_chunk(ray_session):
    out = (
        ray.data.from_items([{"doc_id": "a", "v": 1}, {"doc_id": "b", "v": 2}])
        .map_batches(
            BulkRecordPut("http://127.0.0.1:1", max_retries=1,
                          backoff_s=0.01),
            batch_format="pyarrow", concurrency=1,
        )
        .take_all()
    )
    for r in out:
        assert r["status_code"] == -1 and r["error"] and r["requests"] == 2
