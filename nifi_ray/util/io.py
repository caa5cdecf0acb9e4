"""Parquet read helper that strips schema metadata at the source.

pyarrow schemas whose ``metadata`` dict is populated (e.g. the
``b'pandas'`` blob every pandas-written file carries) are UNHASHABLE
(``hash(schema)`` raises ``unhashable type: 'dict'``), which defeats
Ray Data's block-schema deduplication cache — every unify logs
"Failed to hash the schemas" and pays the slow path on each reduce.
Reading with an explicit metadata-free schema makes every downstream
block schema hashable and silences the warning for good.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa


def clean_schema(path_or_paths, columns: list[str] | None = None) -> pa.Schema:
    """Metadata-free (projected) arrow schema from one parquet footer."""
    import pyarrow.parquet as pq

    p = path_or_paths
    if isinstance(p, (list, tuple)):
        p = p[0]
    if os.path.isdir(p):
        p = sorted(glob.glob(os.path.join(p, "*.parquet")))[0]
    full = pq.read_metadata(p).schema.to_arrow_schema().remove_metadata()
    if columns is None:
        return full
    return pa.schema([full.field(c) for c in columns])


def read_parquet_clean(path_or_paths, *, columns=None, filter=None, **kwargs):
    """``ray.data.read_parquet`` with schema metadata stripped at the
    read task (one driver-side footer fetch; blocks come out with
    hashable schemas). Ray requires the schema pre-projected when
    ``columns=`` is passed."""
    import ray.data as rd

    schema = clean_schema(path_or_paths, columns)
    return rd.read_parquet(
        path_or_paths, schema=schema, columns=columns, filter=filter, **kwargs
    )


def drop_schemaless_empties(ds):
    """Strip the zero-column empty blocks Ray's hash-shuffle join /
    aggregate emits for EMPTY hash partitions (they surface as
    "Operator produced a RefBundle with a different schema … new
    schema: ." warnings and break downstream Arrow kernels — a chained
    join used to need a repartition() workaround per call site). A
    generator map_batches yields only schema-ful blocks, so the block
    stream downstream is schema-uniform again; cost is one zero-copy
    pass-through per block."""
    import pyarrow as _pa

    def keep(t: _pa.Table):
        # empty hash partitions also surface as zero-ROW blocks whose
        # columns are null-typed — equally poisonous to schema unify
        if t.num_columns and t.num_rows:
            yield t

    return ds.map_batches(keep, batch_format="pyarrow")


def silence_mixed_schema_warnings() -> None:
    """Install a targeted logging filter for Ray's streaming-executor
    "Operator produced a RefBundle with a different schema" warning.

    The engine deliberately produces those bundles: Ray's shuffle
    aggregate/join emits EMPTY hash/sort partitions as schema-less
    blocks, which ``drop_schemaless_empties`` strips one operator later
    — the executor logs the mixed-schema boundary before the filter can
    run, so the warning is expected and already handled, not a defect.
    Only that exact message class is dropped; every other executor
    warning still surfaces."""
    import logging

    class _F(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return "produced a RefBundle with a different schema" not in (
                record.getMessage()
            )

    for name in (
        "ray.data._internal.execution.streaming_executor_state",
        "ray.data",
    ):
        logging.getLogger(name).addFilter(_F())
