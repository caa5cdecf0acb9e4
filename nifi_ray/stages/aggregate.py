"""Pre-aggregated (combiner-style) grouped aggregation.

A bare ``ds.groupby(k).aggregate(...)`` shuffles EVERY row. At 100 TB
that is the bottleneck, so the default here is a two-level aggregate
(SURVEY.md §2.8 / ray_guide "Aggregation at scale"):

    map_batches(partial per-batch groupby)   # N rows → ≤ |keys| rows per batch
      → groupby(keys).aggregate(merge)       # shuffle only the partials

Supported: count, sum, min, max, mean (sum+count merged at the end).
NiFi analog: counters are its only aggregation (ProcessSession
.adjustCounter, reference nifi-api/.../processor/ProcessSession.java:161)
— per-task partials merged centrally, exactly this shape.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


_PARTIAL_FUNCS = {"sum": "sum", "min": "min", "max": "max"}


def pre_aggregate(ds, keys: list[str] | str, specs: dict[str, tuple[str, str]]):
    """specs: out_name → (column, agg) with agg in
    {count, sum, min, max, mean}. Returns a Dataset with one row per key
    combo, columns named exactly ``out_name`` (oracle-SQL friendly).
    """
    from ray.data.aggregate import Max, Min, Sum

    if isinstance(keys, str):
        keys = [keys]

    needs_count = any(a in ("count", "mean") for _, a in specs.values())
    # unique partial slots keyed by (col, arrow_fn)
    partial_slots: dict[tuple[str, str], str] = {}
    for _out, (col, agg) in specs.items():
        fn = "sum" if agg in ("sum", "mean") else agg
        if fn in _PARTIAL_FUNCS:
            partial_slots.setdefault((col, fn), f"__{fn}_{col}")

    def partial(batch: pa.Table) -> pa.Table:
        gb_aggs = [(col, fn) for (col, fn) in partial_slots]
        if needs_count:
            gb_aggs.append(([], "count_all"))
        grouped = batch.group_by(keys).aggregate(gb_aggs)
        rename = {f"{col}_{fn}": tmp for (col, fn), tmp in partial_slots.items()}
        if needs_count:
            rename["count_all"] = "__n"
        return grouped.rename_columns(
            [rename.get(n, n) for n in grouped.schema.names]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    merge_aggs = []
    for (col, fn), tmp in partial_slots.items():
        cls = {"sum": Sum, "min": Min, "max": Max}[fn]
        merge_aggs.append(cls(tmp, alias_name=tmp))
    if needs_count:
        merge_aggs.append(Sum("__n", alias_name="__n"))
    from ..util.io import drop_schemaless_empties

    # Ray's hash-shuffle aggregate emits empty hash partitions as
    # schema-less blocks (bench-tail "RefBundle with a different
    # schema" warnings); strip them before finalize
    merged = drop_schemaless_empties(partials.groupby(keys).aggregate(*merge_aggs))

    def finalize(batch: pa.Table) -> pa.Table:
        cols = {k: batch[k] for k in keys}
        for out, (col, agg) in specs.items():
            if agg == "count":
                cols[out] = batch["__n"]
            elif agg == "sum":
                cols[out] = batch[partial_slots[(col, "sum")]]
            elif agg == "mean":
                cols[out] = pc.divide(
                    pc.cast(batch[partial_slots[(col, "sum")]], pa.float64()),
                    pc.cast(batch["__n"], pa.float64()),
                )
            else:
                cols[out] = batch[partial_slots[(col, agg)]]
        return pa.table(cols)

    return merged.map_batches(finalize, batch_format="pyarrow")


def pivot_indicators(col: str, values: list[str], value_col: str | None = None):
    """map_batches body: one int64 indicator column per pivot value
    (``n_<value>`` = 1 when ``col`` equals it, else 0) plus optionally
    ``sum_<value>`` carrying ``value_col`` gated by the same match.
    Feed the result into :func:`pre_aggregate` summing by the row key —
    together they are SQL PIVOT / COUNT(...) FILTER as a combiner-style
    two-level aggregate (the pivot domain is a declared constant, as in
    SQL PIVOT's IN clause; rows outside it contribute zeros)."""

    def fn(batch: pa.Table) -> pa.Table:
        for v in values:
            m = pc.cast(pc.equal(batch[col], v), pa.int64())
            m = pc.fill_null(m, 0)  # null key matches nothing
            batch = batch.append_column(f"n_{v}", m)
            if value_col is not None:
                gated = pc.multiply(
                    pc.cast(m, pa.float64()),
                    pc.cast(pc.fill_null(batch[value_col], 0.0), pa.float64()),
                )
                batch = batch.append_column(f"sum_{v}", gated)
        return batch

    return fn


def global_moments(ds, col: str) -> tuple[int, float, float]:
    """(n, mean, stddev_pop) of a numeric column in ONE streaming scan:
    per-batch (count, sum, sumsq) partials — one row per batch — merged
    on the driver (O(blocks) rows, never the data). The broadcast-tiny
    result is what a second pass filters against (z-score gates,
    normalization), so the data itself is never shuffled."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch[col], pa.float64()).to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        return pa.table(
            {
                "n": pa.array([len(v)], pa.int64()),
                "s": pa.array([float(v.sum())], pa.float64()),
                "ss": pa.array([float((v * v).sum())], pa.float64()),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    s = sum(r["s"] for r in rows)
    ss = sum(r["ss"] for r in rows)
    if n == 0:
        return 0, 0.0, 0.0
    mean = s / n
    var = max(0.0, ss / n - mean * mean)
    return n, mean, var**0.5


def rollup2(ds, k1: str, k2: str, specs: dict[str, tuple[str, str]]) -> pa.Table:
    """GROUP BY ROLLUP(k1, k2) for additive aggregates (count/sum):
    ONE two-level aggregate at the finest grain, then the (k1) and ()
    levels are re-aggregations of those partials — a tiny driver-side
    Arrow group_by over |k1×k2| rows, never a second scan. NULL marks a
    rolled-up key, exactly like SQL ROLLUP's subtotal rows."""
    for _out, (_c, a) in specs.items():
        if a not in ("count", "sum"):
            raise ValueError(f"rollup2 needs additive aggs, got {a}")
    finest = pre_aggregate(ds, [k1, k2], specs).take_all()
    fine = pa.Table.from_pylist(finest)
    outs = list(specs)
    re_aggs = [(o, "sum") for o in outs]
    rename = {f"{o}_sum": o for o in outs}

    def _renamed(t: pa.Table) -> pa.Table:
        return t.rename_columns([rename.get(n, n) for n in t.schema.names])

    mid = _renamed(fine.group_by([k1]).aggregate(re_aggs))
    mid = mid.append_column(k2, pa.nulls(mid.num_rows, fine.schema.field(k2).type))
    top = _renamed(fine.group_by([]).aggregate(re_aggs))
    top = top.append_column(k1, pa.nulls(1, fine.schema.field(k1).type))
    top = top.append_column(k2, pa.nulls(1, fine.schema.field(k2).type))
    cols = [k1, k2, *outs]
    return pa.concat_tables(
        [fine.select(cols), mid.select(cols), top.select(cols)]
    )


def exact_quantiles(
    ds,
    col: str,
    qs: list[float],
    n_buckets: int = 8192,
    collect_threshold: int = 200_000,
) -> pa.Table:
    """EXACT discrete quantiles (DuckDB quantile_disc semantics: the
    element at 1-based ascending rank max(1, ceil(q*n))) without a
    global sort. Classic histogram refinement:

      pass 1  per-batch (count, min, max) partials → n, value range
      pass 2+ fixed-width bucket histogram over the range (per-batch
              int partials, driver merges O(n_buckets) ints), locate
              each target rank's bucket; while a needed bucket still
              holds > collect_threshold rows, re-histogram INSIDE that
              bucket's value range (geometric shrink — at 100 TB two
              refinement rounds bound any bucket to ~N/8192² rows)
      final   filter-scan collects only the ≤threshold candidate
              values, tiny driver-side sort picks exact ranks.

    Every pass is a streaming single-column scan with O(n_buckets)
    partials; the data is never shuffled or globally sorted."""
    import math

    import numpy as np

    def stats_partial(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch[col], pa.float64()).to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return pa.table(
                {
                    "n": pa.array([0], pa.int64()),
                    "lo": pa.array([np.inf], pa.float64()),
                    "hi": pa.array([-np.inf], pa.float64()),
                }
            )
        return pa.table(
            {
                "n": pa.array([len(v)], pa.int64()),
                "lo": pa.array([float(v.min())], pa.float64()),
                "hi": pa.array([float(v.max())], pa.float64()),
            }
        )

    rows = ds.map_batches(stats_partial, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    if n == 0:
        return pa.table({"q": pa.array(qs, pa.float64()),
                         "value": pa.nulls(len(qs), pa.float64())})
    lo = min(r["lo"] for r in rows)
    hi = max(r["hi"] for r in rows)

    # rank for each q (1-based, ascending) — pinned to DuckDB's rule
    targets = {q: max(1, math.ceil(q * n)) for q in qs}

    # Bucket membership is ALWAYS decided by comparisons against an
    # explicit edge array (np.searchsorted), never by (v-lo)/width
    # arithmetic — so histogram counts, collect filters, and refinement
    # sub-ranges agree exactly at float boundaries.
    def hist_over(edges: "np.ndarray", closed_top: bool):
        """One histogram scan: counts per [edges[i], edges[i+1]) bucket
        (last bucket closed iff closed_top — a refined sub-range keeps
        its parent bucket's open top so no row is counted twice).
        Per-batch int partials, driver merge."""
        e_lo, e_hi = edges[0], edges[-1]
        inner = edges[1:-1]
        nb = len(edges) - 1

        def h(batch: pa.Table) -> pa.Table:
            v = pc.cast(batch[col], pa.float64()).to_numpy(zero_copy_only=False)
            v = v[~np.isnan(v)]
            v = v[(v >= e_lo) & ((v <= e_hi) if closed_top else (v < e_hi))]
            idx = np.searchsorted(inner, v, side="right")
            counts = np.bincount(idx, minlength=nb)
            return pa.table({"h": pa.array([counts], pa.list_(pa.int64()))})

        parts = ds.map_batches(h, batch_format="pyarrow").take_all()
        total = np.zeros(nb, dtype=np.int64)
        for p in parts:
            total += np.asarray(p["h"], dtype=np.int64)
        return total

    out_vals: dict[float, float] = {}
    # group targets that refine into the same range to share scans
    # (range_lo, range_hi, closed_top, rank_below, qs)
    pending = [(lo, hi, True, 0, list(qs))]
    while pending:
        r_lo, r_hi, r_closed, below, group = pending.pop()
        edges = np.linspace(r_lo, r_hi, n_buckets + 1)
        counts = hist_over(edges, r_closed)
        cum = np.cumsum(counts)
        next_rounds: dict[int, list[float]] = {}
        for q in group:
            local_rank = targets[q] - below
            b = int(np.searchsorted(cum, local_rank))
            b_lo, b_hi = float(edges[b]), float(edges[b + 1])
            can_split = b_hi > np.nextafter(b_lo, np.inf)
            if counts[b] > collect_threshold and can_split:
                next_rounds.setdefault(b, []).append(q)
            else:
                last = r_closed and b == len(counts) - 1

                def collect(batch: pa.Table, _lo=b_lo, _hi=b_hi, _last=last):
                    v = pc.cast(batch[col], pa.float64()).to_numpy(zero_copy_only=False)
                    v = v[~np.isnan(v)]
                    m = (v >= _lo) & ((v <= _hi) if _last else (v < _hi))
                    return pa.table({"v": pa.array(v[m], pa.float64())})

                collected = ds.map_batches(collect, batch_format="pyarrow").take_all()
                vals = np.sort(np.array([r["v"] for r in collected], dtype=np.float64))
                rank_in_bucket = local_rank - (int(cum[b - 1]) if b > 0 else 0)
                out_vals[q] = float(vals[rank_in_bucket - 1])
        for b, qs_b in next_rounds.items():
            # rows below the sub-range are known exactly from this
            # histogram — no extra counting scan
            below_b = below + (int(cum[b - 1]) if b > 0 else 0)
            child_closed = r_closed and b == len(counts) - 1
            pending.append(
                (float(edges[b]), float(edges[b + 1]), child_closed, below_b, qs_b)
            )

    return pa.table(
        {
            "q": pa.array(qs, pa.float64()),
            "value": pa.array([out_vals[q] for q in qs], pa.float64()),
        }
    )
