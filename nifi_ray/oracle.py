"""Sequential pure-Python oracle for CDC replay (the golden reference).

Applies every change event one at a time, in global ``lsn`` order, to a
plain dict ``{doc_id: row}`` — upsert semantics: ``I``/``U`` both set the
full-row image (an update before any insert still creates the doc,
FIXTURES.md F2), ``D`` removes it (delete of an absent doc is a no-op).
Duplicate LSNs (replayed ranges, F3) are applied once: a second event
with an ``lsn`` already applied is skipped, mirroring the engine's
watermark dedup (NiFi analog: DetectDuplicate keyed get-and-put-if-absent,
reference nifi-standard-processors/.../standard/DetectDuplicate.java:76-118).

Every test compares the engine's materialized lake to this oracle under
per-doc_id token-array equality (BASELINE.json invariant).
"""

from __future__ import annotations

import pyarrow as pa


def apply_events(
    event_tables: list[pa.Table],
    initial: dict[str, dict] | None = None,
    applied_lsns: set[int] | None = None,
) -> dict[str, dict]:
    """Replay events sequentially; returns final {doc_id: row-dict} state.

    ``row-dict`` holds every non-CDC column (tokens, n_tok, source, plus
    any evolved extras); absent evolved columns are None.
    """
    state: dict[str, dict] = dict(initial or {})
    seen: set[int] = applied_lsns if applied_lsns is not None else set()

    rows: list[dict] = []
    for t in event_tables:
        rows.extend(t.to_pylist())
    rows.sort(key=lambda r: r["lsn"])

    for r in rows:
        lsn = r["lsn"]
        if lsn in seen:
            continue
        seen.add(lsn)
        doc = r["doc_id"]
        if r["op"] == "D":
            state.pop(doc, None)
        else:
            payload = {k: v for k, v in r.items() if k not in ("lsn", "op", "doc_id")}
            state[doc] = payload
    return state


def state_from_base(base: pa.Table) -> dict[str, dict]:
    """Initial oracle state from a base table."""
    return {
        r["doc_id"]: {k: v for k, v in r.items() if k != "doc_id"}
        for r in base.to_pylist()
    }


def state_to_table(state: dict[str, dict], schema: pa.Schema) -> pa.Table:
    """Materialize oracle state as an Arrow table with the given base schema."""
    rows = []
    for doc_id in sorted(state):
        row = {"doc_id": doc_id}
        for f in schema:
            if f.name != "doc_id":
                row[f.name] = state[doc_id].get(f.name)
        rows.append(row)
    if not rows:
        return schema.empty_table()
    return pa.Table.from_pylist(rows, schema=schema)
