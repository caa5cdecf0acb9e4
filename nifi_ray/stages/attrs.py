"""Derived/updated columns — the UpdateAttribute family.

NiFi's UpdateAttribute (reference
nifi-update-attribute-bundle/.../UpdateAttribute.java) sets string
attributes from Expression Language; its rules engine is
conditions→actions. Here attributes are typed Arrow columns and the
"expression language" is plain Python producing Arrow arrays
(SURVEY.md §2.9: no EL interpreter is built — vectorized kernels are
the API). ``derive`` is the declarative form; ``when`` is the
rules-engine form (vectorized CASE).
"""

from __future__ import annotations

from typing import Callable, Mapping

import pyarrow as pa
import pyarrow.compute as pc


def derive(columns: Mapping[str, Callable[[pa.Table], pa.Array]]):
    """map_batches body factory: add/replace columns computed from the
    batch. Each callable gets the full batch and returns an array.

        ds.map_batches(derive({"revenue": lambda t: pc.multiply(...)}),
                       batch_format="pyarrow")
    """

    def fn(batch: pa.Table) -> pa.Table:
        for name, make in columns.items():
            arr = make(batch)
            if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
                arr = pa.array(arr)
            if name in batch.schema.names:
                batch = batch.set_column(
                    batch.schema.get_field_index(name), name, arr
                )
            else:
                batch = batch.append_column(name, arr)
        return batch

    return fn


def when(
    rules: list[tuple[Callable[[pa.Table], pa.Array], object]],
    default: object,
    out: str,
    out_type: pa.DataType | None = None,
):
    """Vectorized first-match CASE (UpdateAttribute rules engine analog):
    ``rules`` is an ordered list of (predicate(batch)→bool array, value);
    the first matching rule assigns its value."""

    def fn(batch: pa.Table) -> pa.Table:
        result = pa.nulls(batch.num_rows, out_type or pa.string())
        assigned = pa.array([False] * batch.num_rows)
        for pred, value in rules:
            mask = pc.and_not(pred(batch), assigned)
            result = pc.if_else(mask, pa.scalar(value, result.type), result)
            assigned = pc.or_(assigned, mask)
        result = pc.if_else(assigned, result, pa.scalar(default, result.type))
        if out in batch.schema.names:
            return batch.set_column(batch.schema.get_field_index(out), out, result)
        return batch.append_column(out, result)

    return fn
