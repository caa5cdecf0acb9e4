"""Event-time windowing and ordered per-key analytics.

NiFi 1.1.2 has no event-time windows (SURVEY.md §2.10 — its only
time-ish state is processing-time bin ages and rate windows); a
training-data / CDC engine needs them. Ray-Data-first shapes
(ray_guide 'Streaming-shaped workloads'):

- tumbling window aggregate: the window id is a COLUMN
  (floor(epoch/size)), so it's a plain pre-aggregated groupby — no
  ordering assumption at all;
- session windows / lag: need per-key time order → hash repartition by
  key, sort INSIDE the group (never globally), compute with vectorized
  numpy over the sorted group.

Partitioning assumption (documented per the custom-operator rule):
all rows of one key fit in one task's memory — keys are users/docs,
bounded; for pathological keys the session fn can spill to
sub-windows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def stamp_tumbling_window(ts_col: str, size_sec: int, out: str = "window_start"):
    """map_batches body: window start timestamp column (UTC-naive,
    matching DuckDB's to_timestamp semantics on the same epoch math)."""

    def fn(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(batch[ts_col], pa.int64())  # µs since epoch
        size_us = size_sec * 1_000_000
        # int64 divide truncates (epochs here are non-negative)
        start = pc.multiply(pc.divide(epoch, size_us), size_us)
        return batch.append_column(out, start.cast(pa.timestamp("us")))

    return fn


def sessionize_fn(
    ts_col: str, gap_sec: float, key_col: str, out_prefix: str = "session"
):
    """map_groups body (one key per group): assign session ids — a new
    session starts when the gap to the previous event exceeds
    ``gap_sec``. Emits one row per session: key, session start/end,
    n_events."""
    gap_us = int(gap_sec * 1_000_000)

    def fn(group: pa.Table) -> pa.Table:
        g = group.sort_by(ts_col)
        ts = pc.cast(g[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        new_session = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new_session[1:] = np.diff(ts) > gap_us
        session_id = np.cumsum(new_session) - 1
        starts = np.flatnonzero(new_session)
        ends = np.append(starts[1:], len(ts)) - 1
        return pa.table(
            {
                key_col: pa.array([g[key_col][0].as_py()] * len(starts), g[key_col].type),
                f"{out_prefix}_id": pa.array(np.arange(len(starts)), pa.int64()),
                f"{out_prefix}_start": pa.array(ts[starts], pa.int64()).cast(pa.timestamp("us")),
                f"{out_prefix}_end": pa.array(ts[ends], pa.int64()).cast(pa.timestamp("us")),
                "n_events": pa.array((ends - starts + 1), pa.int64()),
            }
        )

    return fn


def lag_fn(key_col: str, ts_col: str, value_col: str, out: str):
    """map_groups body: previous value per key in time order
    (LAG(value) OVER (PARTITION BY key ORDER BY ts))."""

    def fn(group: pa.Table) -> pa.Table:
        g = group.sort_by([(ts_col, "ascending")])
        vals = g[value_col].to_numpy(zero_copy_only=False)
        prev = np.empty(len(vals), dtype=object)
        prev[0] = None
        prev[1:] = vals[:-1]
        return g.append_column(out, pa.array(prev.tolist(), g[value_col].type))

    return fn


def running_total_fn(
    key_col: str, order_cols: list[str], value_col: str, out: str
):
    """map_groups body (one key per group): cumulative sum of
    ``value_col`` in ``order_cols`` order — SUM(value) OVER
    (PARTITION BY key ORDER BY ... ROWS UNBOUNDED PRECEDING). The
    accumulation is the same left-to-right sequential add the SQL
    window frame performs, so doubles match the oracle bit-for-bit
    up to the documented rounding."""

    def fn(group: pa.Table) -> pa.Table:
        g = group.sort_by([(c, "ascending") for c in order_cols])
        vals = pc.cast(g[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        return g.append_column(out, pa.array(np.cumsum(vals), pa.float64()))

    return fn


def topk_per_group_fn(order_col: str, k: int, tiebreak: str | None = None):
    """map_groups body: top-k rows by ``order_col`` desc (deterministic
    tie-break)."""

    def fn(group: pa.Table) -> pa.Table:
        keys = [(order_col, "descending")]
        if tiebreak:
            keys.append((tiebreak, "ascending"))
        return group.sort_by(keys).slice(0, k)

    return fn


def stamp_hopping_windows(
    ts_col: str, size_sec: int, hop_sec: int, out: str = "window_start"
):
    """map_batches body: replicate each row once per covering hopping
    window (size divisible by hop; an event at t falls in the size/hop
    windows starting at hop_trunc(t) - k·hop, k = 0..size/hop-1). Like
    the tumbling stamp this turns event-time windowing into a plain
    column — downstream is an ordinary pre-aggregated groupby, and the
    replication factor is the constant size/hop, not data-dependent."""
    if size_sec % hop_sec:
        raise ValueError("size must be a multiple of hop")
    n_w = size_sec // hop_sec
    hop_us = hop_sec * 1_000_000

    def fn(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(batch[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        base = (epoch // hop_us) * hop_us
        reps = []
        for k in range(n_w):
            t = batch.append_column(
                out, pa.array(base - k * hop_us, pa.int64()).cast(pa.timestamp("us"))
            )
            reps.append(t)
        return pa.concat_tables(reps)

    return fn


def dense_rank_fn(
    key_col: str, order_col: str, out: str = "rank", descending: bool = True
):
    """map_groups body: DENSE_RANK() OVER (PARTITION BY key ORDER BY
    order_col) — equal values share a rank, no gaps. Vectorized via the
    sorted group's change-points."""

    def fn(group: pa.Table) -> pa.Table:
        g = group.sort_by([(order_col, "descending" if descending else "ascending")])
        v = g[order_col].to_numpy(zero_copy_only=False)
        changed = np.ones(len(v), dtype=np.int64)
        if len(v) > 1:
            changed[1:] = (v[1:] != v[:-1]).astype(np.int64)
        return g.append_column(out, pa.array(np.cumsum(changed), pa.int64()))

    return fn


def group_quantiles_fn(key_col: str, value_col: str, qs: dict[str, float]):
    """map_groups body: per-group EXACT discrete quantiles (DuckDB
    quantile_disc rank rule: 1-based ascending rank max(1, ceil(q·n))).
    One output row per group. Groups are key-bounded (an event type, a
    tenant) so the in-task sort touches one group, never the dataset —
    for quantiles of an UNBOUNDED column use
    aggregate.exact_quantiles' histogram refinement instead."""
    import math

    def fn(group: pa.Table) -> pa.Table:
        v = np.sort(
            pc.cast(group[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        )
        n = len(v)
        cols = {key_col: group[key_col][:1]}
        for name, q in qs.items():
            cols[name] = pa.array([float(v[max(1, math.ceil(q * n)) - 1])], pa.float64())
        return pa.table(cols)

    return fn


def funnel_stage_fn(
    key_col: str, ts_col: str, type_col: str, stages: list[str], out: str = "stage"
):
    """map_groups body: ordered-funnel depth per key — how many of the
    ``stages`` happened in order, each stage's FIRST occurrence
    strictly after the previous stage's first occurrence (the classic
    conversion funnel: view → click → purchase). Emits one row per key
    with the reached depth (0..len(stages))."""

    def fn(group: pa.Table) -> pa.Table:
        ts = pc.cast(group[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        et = group[type_col].to_numpy(zero_copy_only=False)
        depth = 0
        prev = -(1 << 62)
        for s in stages:
            hits = ts[(et == s) & (ts > prev)]
            if len(hits) == 0:
                break
            prev = int(hits.min())
            depth += 1
        return pa.table(
            {
                key_col: group[key_col][:1],
                out: pa.array([depth], pa.int64()),
            }
        )

    return fn


def watermark_late_flags(
    ds,
    ts_col: str,
    id_col: str,
    lateness_sec: float,
    seed: str = "wm",
    bucket_hex: int = 2,
):
    """Beam/Flink-style watermark + allowed-lateness flagging — built on
    a DISTRIBUTED GLOBAL PREFIX-MAX SCAN, the primitive Ray Data has no
    native operator for. The watermark at each arrival is the running
    max of event time over all PRIOR arrivals; an event is late when
    ``ts < watermark - lateness``.

    Arrival order is the deterministic md5 key md5(id '#' seed) (the
    repo's shuffle-key convention — the fixture's stand-in for a real
    out-of-order stream; on live data the key would be the arrival
    LSN). The scan decomposes by key-prefix bucket:

      pass 1  per-block per-bucket max(ts) partials → one tiny
              pre-aggregated exchange (≤ 16^bucket_hex rows per block);
      driver  exclusive prefix-max over the ≤256 sorted bucket maxima
              (constant-size state, never the corpus);
      pass 2  groupby(bucket).map_groups — sort INSIDE the bucket only,
              vectorized running max seeded with the bucket's prefix.

    Total order by key == order by (bucket, key) since the bucket is a
    key prefix, so the two-level scan is exactly the sequential scan.
    No global sort, no O(corpus) driver state — the shape that survives
    10^10 events. Returns the dataset with ``arr_k``/``arr_bucket``/
    ``ts_us``/``late`` appended."""
    import hashlib

    import ray as _ray

    from .aggregate import pre_aggregate

    def stamp(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        k = [hashlib.md5(f"{i}#{seed}".encode()).hexdigest() for i in ids]
        b = [x[:bucket_hex] for x in k]
        return (
            batch.append_column("arr_k", pa.array(k, pa.string()))
            .append_column("arr_bucket", pa.array(b, pa.string()))
            .append_column("ts_us", pc.cast(batch[ts_col], pa.int64()))
        )

    stamped = ds.map_batches(stamp, batch_format="pyarrow")
    bmax = pre_aggregate(
        stamped, "arr_bucket", {"bmax": ("ts_us", "max")}
    ).take_all()  # ≤ 16^bucket_hex rows — constant, never the corpus
    bmax.sort(key=lambda r: r["arr_bucket"])
    prefix: dict[str, int | None] = {}
    cur: int | None = None
    for r in bmax:
        prefix[r["arr_bucket"]] = cur
        cur = r["bmax"] if cur is None else max(cur, r["bmax"])
    ref = _ray.put(prefix)
    late_us = int(lateness_sec * 1_000_000)

    def flag(group: pa.Table) -> pa.Table:
        pre = _ray.get(ref).get(group["arr_bucket"][0].as_py())
        g = group.take(
            pc.sort_indices(group, sort_keys=[("arr_k", "ascending")])
        )
        ts = pc.cast(g["ts_us"], pa.int64()).to_numpy(zero_copy_only=False)
        run = np.maximum.accumulate(ts)
        excl = np.empty_like(run)
        excl[1:] = run[:-1]
        valid = np.ones(ts.size, bool)
        if pre is None:
            valid[0] = False  # globally first arrival: no watermark yet
            excl[0] = 0
        else:
            excl[0] = pre
            np.maximum(excl, np.int64(pre), out=excl)
        late = np.zeros(ts.size, bool)
        late[valid] = (excl[valid] - ts[valid]) > late_us
        return g.append_column("late", pa.array(late))

    return stamped.groupby("arr_bucket").map_groups(
        flag, batch_format="pyarrow"
    )
