"""ConvertJSONToSQL — JSON objects/arrays → parameterized SQL statements.

Reference: nifi-standard-processors/.../standard/ConvertJSONToSQL.java
(:324-615). Per input JSON value:

- an ARRAY explodes into one statement row per element, stamped with
  the fragment contract (``fragment_identifier`` / ``fragment_count``
  / ``fragment_index`` — ConvertJSONToSQL.java:372-375) so PutSQL-style
  fragmented transactions (pipelines/cdc.py defragment barrier) can
  apply them atomically; an OBJECT yields one row (count=1, index=0);
- INSERT lists mapped fields in JSON field order, values extracted to
  ``sql_args_values`` / ``sql_args_types`` (the reference's
  ``sql.args.N.{value,type}`` attributes — parameterized statements,
  never inlined values);
- UPDATE puts non-key mapped fields in SET (JSON order) and update-key
  fields in WHERE (:539-612); update keys default to the schema's
  primary keys;
- column-name normalization = ``upper().replace("_","")`` when
  ``translate_field_names`` (:617-619);
- values longer than the column size are truncated (:451-456);
- failures (unmapped field, missing required column, no mapped fields,
  malformed JSON) never raise: the row gets an ``error`` column and
  routes like REL_FAILURE (:199) via a downstream filter.

Unlike the reference, the fragment identifier is DETERMINISTIC (md5 of
the source JSON + a caller id column when given) — a replayed tick must
regenerate identical fragments or defragment barriers double-count.

Per-row json.loads is inherent to the operator (the reference parses
per FlowFile too); this is an edge parser, not a hot-loop transform.
"""

from __future__ import annotations

import hashlib
import json

import pyarrow as pa

# JDBC Type constants the reference emits (java.sql.Types), for parity
_SQL_TYPES = {
    "varchar": 12,
    "integer": 4,
    "bigint": -5,
    "double": 8,
    "boolean": 16,
    "timestamp": 93,
    "date": 91,
}


class TableSchema:
    """Target-table description: ordered columns with SQL type name,
    optional size cap, required flag; primary keys for UPDATE."""

    def __init__(
        self,
        columns: dict[str, str],
        required: set[str] | None = None,
        primary_keys: tuple[str, ...] = (),
        col_sizes: dict[str, int] | None = None,
        translate: bool = True,
    ):
        self.columns = dict(columns)
        self.required = set(required or ())
        self.primary_keys = tuple(primary_keys)
        self.col_sizes = dict(col_sizes or {})
        self.translate = translate
        self._by_norm = {self._norm(c): c for c in self.columns}

    def _norm(self, name: str) -> str:
        return name.upper().replace("_", "") if self.translate else name

    def lookup(self, field_name: str) -> str | None:
        return self._by_norm.get(self._norm(field_name))


def _coerce(value, col: str, schema: TableSchema) -> str | None:
    if value is None:
        return None
    s = value if isinstance(value, str) else json.dumps(value) if isinstance(value, (dict, list)) else str(value)
    size = schema.col_sizes.get(col)
    if size is not None and len(s) > size:
        s = s[:size]
    return s


def _one_statement(
    obj: dict,
    table: str,
    schema: TableSchema,
    statement_type: str,
    update_keys: tuple[str, ...],
    ignore_unmapped: bool,
):
    """(sql, arg_values, arg_types, error) for one JSON object."""
    if not isinstance(obj, dict):
        return None, None, None, f"not a JSON object: {type(obj).__name__}"
    mapped = []  # (json field, schema col) in JSON field order
    for f in obj:
        col = schema.lookup(f)
        if col is None:
            if not ignore_unmapped:
                return None, None, None, f"cannot map JSON field '{f}' to any column"
            continue
        mapped.append((f, col))
    if not mapped:
        return None, None, None, f"no fields map to columns of {table}"

    vals: list[str | None] = []
    types: list[int] = []

    if statement_type == "INSERT":
        present = {c for _, c in mapped}
        for req in schema.required:
            if req not in present:
                return None, None, None, f"missing required column '{req}'"
        cols = []
        for f, c in mapped:
            cols.append(c)
            vals.append(_coerce(obj[f], c, schema))
            types.append(_SQL_TYPES.get(schema.columns[c], 12))
        sql = (
            f"INSERT INTO {table} ({', '.join(cols)}) "
            f"VALUES ({', '.join('?' * len(cols))})"
        )
        return sql, vals, types, None

    # UPDATE: SET from non-key mapped fields, WHERE from key fields
    keys = update_keys or schema.primary_keys
    if not keys:
        return None, None, None, f"table {table} has no primary key and no update keys given"
    norm_keys = {schema._norm(k) for k in keys}
    present_norm = {schema._norm(c) for _, c in mapped}
    for k in keys:
        if schema._norm(k) not in present_norm:
            return None, None, None, f"missing update-key column '{k}'"
    set_cols = [(f, c) for f, c in mapped if schema._norm(c) not in norm_keys]
    key_cols = [(f, c) for f, c in mapped if schema._norm(c) in norm_keys]
    if not set_cols:
        return None, None, None, "no non-key fields to SET"
    for f, c in set_cols + key_cols:
        vals.append(_coerce(obj[f], c, schema))
        types.append(_SQL_TYPES.get(schema.columns[c], 12))
    sql = (
        f"UPDATE {table} SET {', '.join(f'{c} = ?' for _, c in set_cols)}"
        f" WHERE {' AND '.join(f'{c} = ?' for _, c in key_cols)}"
    )
    return sql, vals, types, None


def convert_json_to_sql(
    col: str,
    table: str,
    schema: TableSchema,
    statement_type: str = "INSERT",
    update_keys: tuple[str, ...] = (),
    ignore_unmapped: bool = False,
    id_col: str | None = None,
    keep_cols: list[str] | None = None,
):
    """map_batches body: JSON column → statement rows with
    ``sql`` / ``sql_args_values`` / ``sql_args_types`` /
    ``fragment_identifier`` / ``fragment_count`` / ``fragment_index`` /
    ``error`` columns. Arrays explode; kept columns replicate."""
    statement_type = statement_type.upper()
    if statement_type not in ("INSERT", "UPDATE"):
        raise ValueError(statement_type)
    keep = keep_cols or []

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[col].to_pylist()
        ids = batch[id_col].to_pylist() if id_col else [None] * len(texts)
        kept = {k: batch[k].to_pylist() for k in keep}

        out = {
            "sql": [],
            "sql_args_values": [],
            "sql_args_types": [],
            "fragment_identifier": [],
            "fragment_count": [],
            "fragment_index": [],
            "error": [],
        }
        out_keep: dict[str, list] = {k: [] for k in keep}

        def emit(row_i, frag_id, count, index, sql, vals, types, err):
            out["sql"].append(sql)
            out["sql_args_values"].append(vals)
            out["sql_args_types"].append(types)
            out["fragment_identifier"].append(frag_id)
            out["fragment_count"].append(count)
            out["fragment_index"].append(index)
            out["error"].append(err)
            for k in keep:
                out_keep[k].append(kept[k][row_i])

        for i, text in enumerate(texts):
            seed = f"{ids[i]}|{text}" if ids[i] is not None else (text or "")
            frag_id = hashlib.md5(seed.encode()).hexdigest()
            if text is None:
                emit(i, frag_id, 1, 0, None, None, None, "null JSON")
                continue
            try:
                root = json.loads(text)
            except (ValueError, TypeError) as e:
                emit(i, frag_id, 1, 0, None, None, None, f"malformed JSON: {e}")
                continue
            elems = root if isinstance(root, list) else [root]
            n = len(elems)
            if n == 0:
                emit(i, frag_id, 0, 0, None, None, None, "empty JSON array")
                continue
            for j, obj in enumerate(elems):
                sql, vals, types, err = _one_statement(
                    obj, table, schema, statement_type, update_keys, ignore_unmapped
                )
                emit(i, frag_id, n, j, sql, vals, types, err)

        cols = {}
        for k in keep:
            cols[k] = pa.array(out_keep[k], batch.schema.field(k).type)
        cols["sql"] = pa.array(out["sql"], pa.string())
        cols["sql_args_values"] = pa.array(
            out["sql_args_values"], pa.list_(pa.string())
        )
        cols["sql_args_types"] = pa.array(out["sql_args_types"], pa.list_(pa.int32()))
        cols["fragment_identifier"] = pa.array(out["fragment_identifier"], pa.string())
        cols["fragment_count"] = pa.array(out["fragment_count"], pa.int64())
        cols["fragment_index"] = pa.array(out["fragment_index"], pa.int64())
        cols["error"] = pa.array(out["error"], pa.string())
        return pa.table(cols)

    return fn
