"""SQL-edge source — ExecuteSQL / QueryDatabaseTable / ListDatabaseTables
analogs over DuckDB (reference
nifi-standard-processors/.../standard/ExecuteSQL.java:240,
QueryDatabaseTable.java:411, ListDatabaseTables.java).

NiFi streams a JDBC ResultSet to Avro (util/JdbcCommon.java:76-177);
the Arrow-native equivalent is DuckDB's zero-copy ``.arrow()`` fetch →
``ray.data.from_arrow``. The watermark-bounded incremental form
(``WHERE maxcol > $state``, QueryDatabaseTable.java:186-348) takes the
watermark explicitly and returns (dataset, new_watermark) so the caller
commits it with its manifest — state lives with the sink, never in the
source (the engine's exactly-once rule).

Scale note: a SQL edge is a driver-side ingest funnel by nature (one
connection). For large tables prefer ``pages`` (GenerateTableFetch
semantics: split the scan into ranged SELECTs fanned out as Ray tasks).
"""

from __future__ import annotations

import pyarrow as pa


def _connect(database: str | None):
    import duckdb

    return duckdb.connect(database or ":memory:", read_only=bool(database))


def read_sql(query: str, database: str | None = None, params=None):
    """One-shot ExecuteSQL: run ``query``, return a Ray Dataset."""
    import ray.data as rd

    con = _connect(database)
    try:
        tbl = con.execute(query, params or []).arrow()
    finally:
        con.close()
    return rd.from_arrow(tbl)


def read_table_incremental(
    table: str,
    max_col: str,
    watermark,
    database: str | None = None,
    columns: list[str] | None = None,
):
    """QueryDatabaseTable: rows with ``max_col > watermark``; returns
    (Dataset, new_watermark). The caller persists new_watermark in its
    commit (manifest), mirroring Scope.CLUSTER state."""
    import ray.data as rd

    cols = ", ".join(columns) if columns else "*"
    con = _connect(database)
    try:
        tbl = con.execute(
            f"SELECT {cols} FROM {table} WHERE {max_col} > ? ORDER BY {max_col}",
            [watermark],
        ).arrow()
        hi = con.execute(
            f"SELECT max({max_col}) FROM {table}"
        ).fetchone()[0]
    finally:
        con.close()
    new_wm = watermark if hi is None else max(watermark, hi)
    return rd.from_arrow(tbl), new_wm


def generate_table_fetch(
    table: str,
    order_col: str,
    page_size: int,
    database: str | None = None,
    where: str | None = None,
    columns: list[str] | None = None,
) -> list[str]:
    """GenerateTableFetch: emit ranged SELECT statements covering the
    table in ``page_size`` chunks — the shard list a caller fans out as
    parallel read_sql tasks (GenerateTableFetch.java:258 emits paged
    statements for downstream parallel fetch the same way). Pass
    ``columns`` so only needed columns leave the database (the
    prune-at-the-read rule).

    Pages are KEYSET RANGES (``order_col >= lo AND < hi``), not
    LIMIT/OFFSET: offset paging re-sorts the whole filtered table per
    page — O(pages × table) total work — and duplicates/drops rows
    when the table changes between pages. Boundary values come from
    ONE ordered window pass at planning time; each page then executes
    as a zone-map/index range scan. Duplicate boundary values (heavy
    key skew) collapse into one page, so pages stay DISJOINT and their
    union exact even on non-unique order columns — page sizes then
    vary with the skew, which is the correct trade."""
    con = _connect(database)
    try:
        pred = f" WHERE {where}" if where else ""
        bounds = [
            r[0]
            for r in con.execute(
                f"SELECT {order_col} FROM ("
                f" SELECT {order_col},"
                f"  row_number() OVER (ORDER BY {order_col}) AS rn"
                f" FROM {table}{pred})"
                f" WHERE (rn - 1) % {int(page_size)} = 0 ORDER BY 1"
            ).fetchall()
        ]
    finally:
        con.close()
    if not bounds:
        return []
    uniq = sorted(set(bounds))
    cols = ", ".join(columns) if columns else "*"

    def lit(v):
        if isinstance(v, str):
            # control characters (NUL especially) cannot appear inside a
            # quoted SQL literal — emit those boundaries as
            # decode(from_hex(..)) which is parser-safe for ANY content
            if any(ord(c) < 0x20 or ord(c) == 0x7F for c in v):
                return f"decode(from_hex('{v.encode('utf-8').hex()}'))"
            return "'" + v.replace("'", "''") + "'"
        return repr(v)

    stmts = []
    for i, lo in enumerate(uniq):
        rng = f"{order_col} >= {lit(lo)}"
        if i + 1 < len(uniq):
            rng += f" AND {order_col} < {lit(uniq[i + 1])}"
        glue = f"{pred} AND " if where else " WHERE "
        stmts.append(f"SELECT {cols} FROM {table}{glue}{rng}")
    return stmts


class PageFetch:
    """Actor-pool stage executing fanned-out GenerateTableFetch pages:
    one DuckDB connection per actor (opened once in ``__init__`` — the
    load-once-per-worker rule), each input row is one page statement,
    output is that page's rows. This is the distributed half of the
    ExecuteSQL / GenerateTableFetch pair: the statement list is tiny
    driver-side metadata; the row payloads only ever exist inside the
    fetching task."""

    def __init__(self, database: str | None = None):
        import duckdb

        self.con = duckdb.connect(
            database or ":memory:", read_only=bool(database)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        tabs = []
        for stmt in batch["sql"].to_pylist():
            t = self.con.execute(stmt).arrow()
            if isinstance(t, pa.RecordBatchReader):
                t = t.read_all()
            tabs.append(t)
        return pa.concat_tables(tabs)


def list_tables(database: str | None = None) -> pa.Table:
    """ListDatabaseTables: catalog listing as an Arrow table."""
    con = _connect(database)
    try:
        return con.execute(
            "SELECT schema_name, table_name, estimated_size AS est_rows "
            "FROM duckdb_tables()"
        ).arrow()
    finally:
        con.close()


def execute_sql_to_avro(
    query: str,
    out_path: str,
    database: str | None = None,
    params=None,
    codec: str = "deflate",
    block_rows: int = 4096,
) -> int:
    """ExecuteSQL's actual output contract: ResultSet → Avro container
    (reference util/JdbcCommon.convertToAvroStream, JdbcCommon.java:
    76-177 — NiFi emits one Avro FlowFile per query). Written atomically
    (tmp + rename). Returns the row count."""
    import os

    from .avro import table_to_avro

    con = _connect(database)
    try:
        tbl = con.execute(query, params or []).arrow()
    finally:
        con.close()
    if isinstance(tbl, pa.RecordBatchReader):  # duckdb>=1.3 returns reader
        tbl = tbl.read_all()
    data = table_to_avro(tbl, codec=codec, block_rows=block_rows)
    tmp = out_path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, out_path)
    return tbl.num_rows
