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
