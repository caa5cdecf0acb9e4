"""Schema evolution: column add + numeric widening via Arrow unification.

When a change-event batch arrives whose payload schema is a superset /
widening of the lake's current schema, the lake schema evolves: new
columns are null-filled for existing rows, widened types (int32→int64)
are promoted. The manifest's ``schema_version`` bumps on every change.

NiFi analog: ConvertAvroSchema's declarative Avro→Avro migration and
JdbcCommon's on-the-fly schema construction (reference
nifi-nar-bundles/.../kite/ConvertAvroSchema.java;
nifi-standard-processors/.../util/JdbcCommon.java:229-242) — but here
evolution is a first-class lake operation, not a per-processor parse.
"""

from __future__ import annotations

import pyarrow as pa


def unify(current: pa.Schema, incoming: pa.Schema) -> pa.Schema:
    """Evolved schema covering both; raises on incompatible changes."""
    return pa.unify_schemas([current, incoming], promote_options="permissive")


def schemas_equal(a: pa.Schema, b: pa.Schema) -> bool:
    return a.equals(b)


def conform(table: pa.Table, target: pa.Schema) -> pa.Table:
    """Cast a table to the target schema: missing columns are null-filled,
    compatible types are cast, column order normalized."""
    cols = []
    for f in target:
        if f.name in table.schema.names:
            col = table[f.name]
            if col.type != f.type:
                col = col.cast(f.type)
        else:
            col = pa.nulls(table.num_rows, f.type)
        cols.append(col)
    return pa.table(cols, schema=target)
