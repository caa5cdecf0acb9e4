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
