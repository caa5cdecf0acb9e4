"""MetricsReporter — ReportingTask analog (reference
nifi-ambari-reporting-task/.../AmbariReportingTask.java:114 onTrigger:
build one JSON metrics document per trigger, POST to the collector,
resend across failed triggers)."""

import http.server
import json
import socketserver
import threading

import pytest

from nifi_ray.state.metrics import MetricsReporter, append_tick_metrics


def _tick(lake_dir, version, lo, hi, events, wall=0.5):
    append_tick_metrics(
        lake_dir, version, (lo, hi), wall,
        [{"partition_id": 0, "events_applied": events, "rows": events,
          "max_lsn": hi, "bytes_written": 100 * events, "dups_dropped": 1}],
    )


@pytest.fixture()
def collector():
    state = {"fail": 0, "received": []}

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            if state["fail"] > 0:
                state["fail"] -= 1
                self.send_response(503)
            else:
                state["received"].append(json.loads(body))
                self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    class Srv(socketserver.ThreadingMixIn, http.server.HTTPServer):
        daemon_threads = True

    srv = Srv(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}/metrics", state
    finally:
        srv.shutdown()
        srv.server_close()


def test_reporter_aggregates_and_advances_cursor(tmp_path, collector):
    url, state = collector
    lake = str(tmp_path)
    _tick(lake, 2, 0, 100, 40)
    _tick(lake, 3, 100, 200, 60)
    rep = MetricsReporter(lake, url, application_id="t", backoff_s=0.01)
    r = rep.report_once()
    assert r["sent"] and r["ticks"] == 2 and r["attempts"] == 1
    doc = state["received"][-1]
    m = doc["metrics"]
    assert doc["application_id"] == "t" and doc["hostname"]
    assert m["events_applied"] == 100 and m["version"] == 3
    assert m["lsn_hi"] == 200 and m["bytes_written"] == 10000
    assert m["dups_dropped"] == 2 and m["wall_sec"] == 1.0
    # nothing new → no request
    assert rep.report_once() == {"sent": False, "reason": "no new ticks"}
    # only NEW ticks are aggregated next trigger
    _tick(lake, 4, 200, 300, 5)
    r = rep.report_once()
    assert r["sent"] and r["ticks"] == 1
    assert state["received"][-1]["metrics"]["events_applied"] == 5


def test_reporter_resends_after_collector_outage(tmp_path, collector):
    url, state = collector
    lake = str(tmp_path)
    _tick(lake, 2, 0, 100, 40)
    rep = MetricsReporter(lake, url, max_retries=0, backoff_s=0.01)
    state["fail"] = 1  # collector down for this trigger
    r = rep.report_once()
    assert not r["sent"] and r["status"] == 503
    _tick(lake, 3, 100, 200, 60)
    # next trigger re-sends the unacknowledged tick together with the new one
    r = rep.report_once()
    assert r["sent"] and r["ticks"] == 2
    assert state["received"][-1]["metrics"]["events_applied"] == 100


def test_reporter_includes_lag_when_log_head_given(tmp_path, collector):
    url, state = collector
    from nifi_ray.state.manifest import Manifest, commit_manifest

    import pyarrow as pa

    lake = str(tmp_path)
    m = Manifest(
        version=1, num_partitions=1, schema_version=1,
        schema=pa.schema([("doc_id", pa.string())]), applied_through=150,
        partitions={"0": {"rows": 1, "max_lsn": 150, "file": "x"}},
    )
    commit_manifest(lake, m)
    _tick(lake, 1, 0, 150, 10)
    rep = MetricsReporter(lake, url, backoff_s=0.01)
    assert rep.report_once(log_head_lsn=200)["sent"]
    m = state["received"][-1]["metrics"]
    assert m["lag"] == 50 and m["max_partition_lag"] == 50
