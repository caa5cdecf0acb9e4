"""Per-partition throughput / lag metrics.

NiFi exposes flow health via counters, status history and
MonitorActivity (reference nifi-api/.../processor/ProcessSession.java:161
adjustCounter; nifi-standard-processors/.../standard/MonitorActivity.java).
Here each replay tick appends one JSON line per commit to
``<lake>/_metrics/metrics.jsonl`` with per-partition detail, and
``lag_report`` summarizes how far each partition trails the log head —
the signal a scheduler would alert on.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


def metrics_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_metrics", "metrics.jsonl")


def append_tick_metrics(
    lake_dir: str,
    version: int,
    lsn_range: tuple[int, int],
    wall_sec: float,
    partition_stats: list[dict[str, Any]],
) -> dict[str, Any]:
    """One line per commit: aggregate + per-partition events/rows/bytes."""
    events = sum(int(r["events_applied"]) for r in partition_stats)
    rec = {
        "ts": time.time(),
        "version": version,
        "lsn_range": list(lsn_range),
        "wall_sec": round(wall_sec, 3),
        "events_applied": events,
        "events_per_sec": round(events / wall_sec, 1) if wall_sec > 0 else None,
        "partitions": {
            str(int(r["partition_id"])): {
                "events": int(r["events_applied"]),
                # delta-mode rows carry delta_rows instead of rows
                "rows": int(r.get("rows", r.get("delta_rows", 0))),
                "max_lsn": int(r["max_lsn"]),
                "bytes_written": int(r["bytes_written"]),
                "dups_dropped": int(r["dups_dropped"]),
            }
            for r in partition_stats
        },
    }
    path = metrics_path(lake_dir)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def lag_report(lake_dir: str, log_head_lsn: int) -> dict[str, Any]:
    """How far each partition trails the newest LSN in the source log."""
    from .manifest import load_manifest

    m = load_manifest(lake_dir)
    if m is None:
        return {"error": "no manifest"}
    per_part = {
        str(k): {
            "max_lsn": e["max_lsn"],
            "lag": max(0, log_head_lsn - max(e["max_lsn"], m.applied_through)),
        }
        for k, e in sorted(m.partitions.items())
    }
    return {
        "applied_through": m.applied_through,
        "log_head_lsn": log_head_lsn,
        "lag": max(0, log_head_lsn - m.applied_through),
        "partitions": per_part,
    }


def read_metrics(lake_dir: str) -> list[dict[str, Any]]:
    path = metrics_path(lake_dir)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


class MetricsReporter:
    """Push-based flow-health reporting — the ReportingTask analog
    (reference nifi-ambari-bundle/nifi-ambari-reporting-task/src/main/
    java/org/apache/nifi/reporting/ambari/AmbariReportingTask.java:114
    onTrigger builds one JSON metrics document per trigger and POSTs it
    to the collector URL; the datadog bundle's MetricsService computes
    the same counter set). Each ``report_once`` call reads the tick
    records appended to ``metrics.jsonl`` since the last acknowledged
    report (a persisted byte-offset cursor), aggregates them into one
    snapshot document, and POSTs it. The cursor advances ONLY after the
    collector's 2xx — ack-after-success, so an unreachable collector
    means the same ticks are re-aggregated and re-sent next trigger
    (at-least-once; the reference retains ``previousMetrics`` across
    failed triggers the same way). Metric names follow the reference's
    MetricNames (FlowFilesReceived/Sent → events_applied, BytesWritten,
    ActiveThreads → partitions_touched).
    """

    def __init__(
        self,
        lake_dir: str,
        url: str,
        application_id: str = "nifi_ray",
        hostname: str | None = None,
        timeout: float = 5.0,
        max_retries: int = 2,
        backoff_s: float = 0.05,
    ):
        import socket
        import urllib.request

        self.lake_dir, self.url = lake_dir, url
        self.application_id = application_id
        self.hostname = hostname or socket.gethostname()
        self.timeout, self.max_retries = timeout, max_retries
        self.backoff_s = backoff_s
        self.opener = urllib.request.build_opener()
        self._cursor_path = os.path.join(
            lake_dir, "_metrics", "reporter_cursor.json")

    # ------------------------------------------------------------ cursor
    def _cursor(self) -> int:
        try:
            with open(self._cursor_path) as f:
                return int(json.load(f)["offset"])
        except (FileNotFoundError, ValueError, KeyError):
            return 0

    def _commit_cursor(self, offset: int) -> None:
        tmp = self._cursor_path + ".tmp"
        os.makedirs(os.path.dirname(self._cursor_path), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump({"offset": offset}, f)
        os.replace(tmp, self._cursor_path)

    # ----------------------------------------------------------- collect
    def collect(self, log_head_lsn: int | None = None
                ) -> tuple[dict[str, Any] | None, int]:
        """Aggregate unreported tick records into one snapshot document.
        Returns (payload | None if nothing new, next_cursor_offset)."""
        path = metrics_path(self.lake_dir)
        start = self._cursor()
        recs: list[dict[str, Any]] = []
        end = start
        if os.path.exists(path):
            with open(path) as f:
                f.seek(start)
                while True:
                    line = f.readline()
                    if not line:
                        break
                    if line.endswith("\n") and line.strip():
                        recs.append(json.loads(line))
                        end = f.tell()  # only whole lines advance the cursor
        if not recs:
            return None, start
        events = sum(r["events_applied"] for r in recs)
        wall = sum(r["wall_sec"] for r in recs)
        payload = {
            "application_id": self.application_id,
            "hostname": self.hostname,
            "timestamp": recs[-1]["ts"],
            "metrics": {
                "ticks": len(recs),
                "version": recs[-1]["version"],
                "lsn_hi": recs[-1]["lsn_range"][1],
                "events_applied": events,
                "events_per_sec": round(events / wall, 1) if wall else None,
                "wall_sec": round(wall, 3),
                "bytes_written": sum(
                    p["bytes_written"]
                    for r in recs for p in r["partitions"].values()),
                "dups_dropped": sum(
                    p["dups_dropped"]
                    for r in recs for p in r["partitions"].values()),
                "partitions_touched": max(
                    len(r["partitions"]) for r in recs),
            },
        }
        if log_head_lsn is not None:
            lag = lag_report(self.lake_dir, log_head_lsn)
            payload["metrics"]["lag"] = lag.get("lag")
            payload["metrics"]["max_partition_lag"] = max(
                (p["lag"] for p in lag.get("partitions", {}).values()),
                default=0)
        return payload, end

    # ------------------------------------------------------------- report
    def report_once(self, log_head_lsn: int | None = None) -> dict[str, Any]:
        """One trigger: collect → POST → advance cursor on 2xx only."""
        import time as _time
        import urllib.error
        import urllib.request

        payload, end = self.collect(log_head_lsn)
        if payload is None:
            return {"sent": False, "reason": "no new ticks"}
        body = json.dumps(payload).encode()
        last_err: str | None = None
        status = -1
        for attempt in range(1, self.max_retries + 2):
            try:
                req = urllib.request.Request(
                    self.url, data=body, method="POST")
                req.add_header("Content-Type", "application/json")
                with self.opener.open(req, timeout=self.timeout) as resp:
                    status = resp.status
                self._commit_cursor(end)
                return {"sent": True, "status": status,
                        "ticks": payload["metrics"]["ticks"],
                        "attempts": attempt}
            except urllib.error.HTTPError as e:
                status, last_err = e.code, f"HTTP {e.code}"
                if 400 <= e.code < 500:
                    break  # non-retryable; cursor NOT advanced
            except Exception as e:  # noqa: BLE001 — transport
                status, last_err = -1, f"{type(e).__name__}: {e}"
            if attempt <= self.max_retries:
                _time.sleep(self.backoff_s * (2 ** (attempt - 1)))
        return {"sent": False, "status": status, "error": last_err,
                "ticks": payload["metrics"]["ticks"]}
