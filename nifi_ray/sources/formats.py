"""Record-format ingestion & conversion — the CSV/JSON/Avro family.

NiFi 1.1.2 converts between content formats with per-processor parsers
(reference: kite bundle ConvertCSVToAvro.java / ConvertJSONToAvro.java /
InferAvroSchema.java; nifi-standard-processors ConvertJSONToSQL.java;
avro bundle ConvertAvroToJSON.java). Ray Data reads these natively
(`read_csv` / `read_json`), so the engine's job is the SCHEMA side:
coerce whatever arrived into the declared Arrow schema (typed cast,
null-fill missing, drop extras = NiFi ConvertAvroSchema semantics) —
one `conform` away from the lake's evolution machinery.
"""

from __future__ import annotations

import pyarrow as pa

from ..schema import EVENT_SCHEMA
from ..stages.evolve import conform


def read_events_csv(paths, schema: pa.Schema = EVENT_SCHEMA, **kwargs):
    """CSV → typed change events. tokens (list<int32>) is carried as a
    space-separated string column `tokens_str` in CSV (CSV has no list
    type) and parsed vectorized."""
    import ray.data as rd

    ds = rd.read_csv(paths, **kwargs)
    return ds.map_batches(_csv_to_events(schema), batch_format="pyarrow")


def _csv_to_events(schema: pa.Schema):
    import numpy as np
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        if "tokens_str" in batch.schema.names and "tokens" not in batch.schema.names:
            s = pc.split_pattern(
                pc.coalesce(batch["tokens_str"], pa.scalar("")), pattern=" "
            )
            # "" splits to [""] → map empty payloads to null lists
            lens = pc.list_value_length(s)
            flat = s.combine_chunks().flatten() if isinstance(s, pa.ChunkedArray) else s.flatten()
            ints = pc.cast(
                pc.if_else(pc.equal(flat, ""), pa.scalar("0"), flat), pa.int32()
            )
            lens_np = lens.to_numpy(zero_copy_only=False)
            offsets = np.zeros(len(lens_np) + 1, dtype=np.int32)
            np.cumsum(lens_np, out=offsets[1:])
            lists = pa.ListArray.from_arrays(pa.array(offsets), ints)
            empty = pc.or_kleene(
                pc.is_null(batch["tokens_str"]), pc.equal(batch["tokens_str"], "")
            )
            # CSV writes both null tokens and [] as "": the op column
            # disambiguates — only deletes carry a null payload, an
            # empty I/U payload is a genuine empty token list
            is_delete = (
                pc.equal(batch["op"], "D")
                if "op" in batch.schema.names
                else pa.array([True] * len(batch))
            )
            to_null = pc.and_kleene(empty, is_delete)
            empty_list = pa.ListArray.from_arrays(
                pa.array(np.zeros(len(batch) + 1, dtype=np.int32)),
                pa.array([], pa.int32()),
            )
            lists = pc.if_else(to_null, pa.nulls(len(lists), lists.type), lists)
            lists = pc.if_else(
                pc.and_kleene(empty, pc.invert(is_delete)), empty_list, lists
            )
            batch = batch.drop_columns(["tokens_str"]).append_column("tokens", lists)
        # CSV cannot distinguish null from "" — payload string columns
        # (everything but the CDC keys) map "" back to null
        for name in batch.schema.names:
            if name in ("op", "doc_id", "lsn"):
                continue
            col = batch[name]
            if pa.types.is_string(col.type):
                fixed = pc.if_else(pc.equal(col, ""), pa.nulls(len(batch), col.type), col)
                batch = batch.set_column(batch.schema.get_field_index(name), name, fixed)
        return conform(batch, schema)

    return fn


def read_events_json(paths, schema: pa.Schema = EVENT_SCHEMA, **kwargs):
    """JSON-lines → typed change events (lists parse natively)."""
    import ray.data as rd

    ds = rd.read_json(paths, **kwargs)
    return ds.map_batches(lambda t: conform(t, schema), batch_format="pyarrow")


def convert_record(table: pa.Table, target: pa.Schema) -> pa.Table:
    """ConvertAvroSchema analog: cast/null-fill/reorder to target."""
    return conform(table, target)


def events_to_csv_table(events: pa.Table) -> pa.Table:
    """Inverse mapping for round-trips: tokens list → space-joined string."""
    import pyarrow.compute as pc

    toks = events["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    joined = pc.binary_join(pc.cast(toks, pa.list_(pa.string())), " ")
    out = events.drop_columns(["tokens"]).append_column("tokens_str", joined)
    return out


def read_orc(paths, columns: list[str] | None = None):
    """ORC ingestion (ConvertAvroToORC's output side, reference
    nifi-hive-bundle/.../ConvertAvroToORC.java — the lake speaks ORC
    too). One read task per file via ``read_binary_files`` →
    ``pyarrow.orc`` decode keeps the read distributed and
    column-pruned without a dedicated datasource."""
    import io

    import ray.data as rd

    def decode(batch: pa.Table) -> pa.Table:
        from pyarrow import orc

        tables = [
            orc.ORCFile(io.BytesIO(b)).read(columns=columns)
            for b in batch["bytes"].to_pylist()
        ]
        return pa.concat_tables(tables) if tables else pa.table({})

    return rd.read_binary_files(paths).map_batches(
        decode, batch_format="pyarrow", batch_size=1
    )


def write_orc(ds, out_dir: str):
    """Dataset → one ORC file per block under ``out_dir`` (tmp-write +
    atomic rename, PutFile's two-phase contract). Returns file count."""
    import os
    import uuid

    from pyarrow import orc

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        name = f"part-{uuid.uuid4().hex}.orc"
        tmp = os.path.join(out_dir, f".{name}.tmp")
        orc.write_table(batch, tmp)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"rows": pa.array([batch.num_rows], pa.int64())})

    counts = ds.map_batches(write_block, batch_format="pyarrow").take_all()
    return len(counts)
