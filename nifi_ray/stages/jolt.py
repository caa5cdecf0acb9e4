"""JoltTransformJSON analog — declarative JSON→JSON transforms
(reference nifi-standard-bundle/.../standard/JoltTransformJSON.java:306;
the Jolt spec language itself is the public bazaarvoice/jolt project).

Supported operations (the everyday subset):

- ``shift``:   {"old.path": "new.path"} — move values by dotted path
               (missing sources are skipped, like Jolt).
- ``default``: {"path": value} — set when absent.
- ``remove``:  ["path", ...] — delete paths.

A chain of operations runs in order, each on the previous output —
exactly Jolt's spec-list semantics. Per-record JSON parse is the
operator (no vectorized JSON kernel exists for restructuring); run it
as an actor-pool stage so specs compile once per actor.
"""

from __future__ import annotations

import json

import pyarrow as pa


def _get_path(obj, path: list[str]):
    for p in path:
        if not isinstance(obj, dict) or p not in obj:
            return None, False
        obj = obj[p]
    return obj, True


def _set_path(obj: dict, path: list[str], value) -> None:
    for p in path[:-1]:
        nxt = obj.get(p)
        if not isinstance(nxt, dict):
            nxt = {}
            obj[p] = nxt
        obj = nxt
    obj[path[-1]] = value


def _del_path(obj, path: list[str]) -> None:
    for p in path[:-1]:
        if not isinstance(obj, dict) or p not in obj:
            return
        obj = obj[p]
    if isinstance(obj, dict):
        obj.pop(path[-1], None)


def apply_spec(doc, spec_chain: list[dict]):
    """Run a Jolt-style spec chain over one parsed JSON value."""
    for op in spec_chain:
        kind = op["operation"]
        spec = op.get("spec", {})
        if kind == "shift":
            out: dict = {}
            for src, dst in spec.items():
                v, found = _get_path(doc, src.split("."))
                if found:
                    _set_path(out, dst.split("."), v)
            doc = out
        elif kind == "default":
            if not isinstance(doc, dict):
                doc = {}
            for path, value in spec.items():
                parts = path.split(".")
                _cur, found = _get_path(doc, parts)
                if not found:
                    _set_path(doc, parts, value)
        elif kind == "remove":
            paths = spec if isinstance(spec, list) else list(spec)
            for path in paths:
                _del_path(doc, path.split("."))
        else:
            raise ValueError(f"unsupported jolt operation {kind!r}")
    return doc


class JoltTransform:
    """Actor-pool stage: apply a Jolt-style spec chain to a JSON string
    column. Unparseable input yields null (NiFi routes those to
    'failure')."""

    def __init__(self, spec_chain: list[dict], col: str = "json", out: str | None = None):
        # validate the chain once per actor
        for op in spec_chain:
            if op.get("operation") not in ("shift", "default", "remove"):
                raise ValueError(f"unsupported jolt operation {op.get('operation')!r}")
        self.chain = spec_chain
        self.col, self.out = col, out or col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = []
        for s in batch[self.col].to_pylist():
            if s is None:
                vals.append(None)
                continue
            try:
                doc = json.loads(s)
            except (json.JSONDecodeError, TypeError):
                vals.append(None)
                continue
            vals.append(
                json.dumps(apply_spec(doc, self.chain), separators=(",", ":"), sort_keys=True)
            )
        arr = pa.array(vals, pa.string())
        if self.out in batch.schema.names:
            return batch.set_column(batch.schema.get_field_index(self.out), self.out, arr)
        return batch.append_column(self.out, arr)
