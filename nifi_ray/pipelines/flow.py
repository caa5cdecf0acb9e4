"""Declarative flow builder — the flow.xml analog compiled to Ray
Datasets (SURVEY §3.1: NiFi's user-configured processor graph becomes a
declarative config compiled to a Dataset chain).

A ``Flow`` is a named DAG of nodes:

    source   a Dataset (or zero-arg factory) — GetFile/Consume* edge
    stage    map_batches transform (fn or actor class) — any processor
    filter   predicate branch — one RouteOnAttribute relationship
    union    funnel (ds.union of upstreams)
    sink     terminal consumer fn(ds) -> result — Put* egress

Compilation is lazy and memoized per node: a diamond (one stage feeding
two branches) compiles the shared upstream ONCE and reuses the same
lazy Dataset object for both consumers. Ray re-executes the shared
prefix per consumed branch — the streaming-safe default at scale (no
hidden materialization); pass ``cache_fanout=True`` to materialize any
node with >1 consumer instead (NiFi's queue-copy semantics, worth it
when the fan-out is wide and the upstream expensive).

``Flow.from_config(spec, registry)`` builds the same DAG from plain
dicts (JSON/YAML-able) with callables resolved through an explicit
``registry`` — config stays data, no dotted-path import/eval (the NAR
classloader stays dead).

NiFi references: graph model StandardProcessGroup/StandardConnection
(nifi-framework-core/.../groups/StandardProcessGroup.java), funnels
(nifi-docs/.../nifi-in-depth.adoc:158), relationship routing
(nifi-api/.../processor/Relationship.java).
"""

from __future__ import annotations

from typing import Any, Callable


class Flow:
    def __init__(self, cache_fanout: bool = False):
        self._nodes: dict[str, dict] = {}
        self._cache_fanout = cache_fanout
        self._compiled: dict[str, Any] = {}

    # ------------------------------------------------------- builders

    def _add(self, name: str, kind: str, deps: list[str], **payload) -> "Flow":
        if name in self._nodes:
            raise ValueError(f"duplicate node {name!r}")
        for d in deps:
            if d not in self._nodes:
                raise ValueError(f"node {name!r} references unknown upstream {d!r}")
        self._nodes[name] = {"kind": kind, "deps": deps, **payload}
        return self

    def source(self, name: str, ds) -> "Flow":
        """``ds``: a Dataset or a zero-arg factory returning one."""
        return self._add(name, "source", [], ds=ds)

    def stage(self, name: str, upstream: str, fn, **map_batches_kwargs) -> "Flow":
        """map_batches node; ``fn`` may be a callable class (actor pool —
        pass concurrency=... like any map_batches). batch_format
        defaults to pyarrow."""
        map_batches_kwargs.setdefault("batch_format", "pyarrow")
        return self._add(name, "stage", [upstream], fn=fn, kwargs=map_batches_kwargs)

    def filter(self, name: str, upstream: str, predicate) -> "Flow":
        """One relationship of a router: ``predicate`` is a Ray Data
        filter expr string (e.g. "route == 'error'") or a row fn."""
        return self._add(name, "filter", [upstream], predicate=predicate)

    def union(self, name: str, upstreams: list[str]) -> "Flow":
        """Funnel: ds.union of the upstream branches."""
        if not upstreams:
            raise ValueError("union needs at least one upstream")
        return self._add(name, "union", list(upstreams))

    def sink(self, name: str, upstream: str, consume: Callable[[Any], Any]) -> "Flow":
        """Terminal consumer: ``consume(ds)`` runs at ``run()`` time and
        its return value is the sink's result (write_parquet call,
        aggregation, take, ...)."""
        return self._add(name, "sink", [upstream], consume=consume)

    # ------------------------------------------------------- compile

    def _fanout(self) -> dict[str, int]:
        counts = {n: 0 for n in self._nodes}
        for spec in self._nodes.values():
            for d in spec["deps"]:
                counts[d] += 1
        return counts

    def dataset(self, name: str, _stack: tuple = ()):
        """Compile (memoized) the node's lazy Dataset."""
        if name in self._compiled:
            return self._compiled[name]
        if name in _stack:
            raise ValueError(f"cycle through {name!r}: {' -> '.join(_stack + (name,))}")
        spec = self._nodes[name]
        stack = _stack + (name,)
        kind = spec["kind"]
        if kind == "source":
            ds = spec["ds"]() if callable(spec["ds"]) else spec["ds"]
        elif kind == "stage":
            ds = self.dataset(spec["deps"][0], stack).map_batches(
                spec["fn"], **spec["kwargs"]
            )
        elif kind == "filter":
            up = self.dataset(spec["deps"][0], stack)
            pred = spec["predicate"]
            ds = up.filter(expr=pred) if isinstance(pred, str) else up.filter(pred)
        elif kind == "union":
            deps = [self.dataset(d, stack) for d in spec["deps"]]
            ds = deps[0].union(*deps[1:]) if len(deps) > 1 else deps[0]
        elif kind == "sink":
            ds = self.dataset(spec["deps"][0], stack)
        else:  # pragma: no cover
            raise ValueError(f"unknown node kind {kind!r}")
        if self._cache_fanout and self._fanout().get(name, 0) > 1 and kind != "sink":
            ds = ds.materialize()
        self._compiled[name] = ds
        return ds

    def run(self) -> dict[str, Any]:
        """Execute every sink; returns {sink_name: consume(ds) result}.
        With no sinks, returns every terminal node's lazy Dataset."""
        sinks = {n: s for n, s in self._nodes.items() if s["kind"] == "sink"}
        if sinks:
            return {n: s["consume"](self.dataset(n)) for n, s in sinks.items()}
        fan = self._fanout()
        return {n: self.dataset(n) for n, c in fan.items() if c == 0}

    # ------------------------------------------------------- config

    @classmethod
    def from_config(cls, spec: list[dict], registry: dict[str, Any],
                    cache_fanout: bool = False) -> "Flow":
        """Build from plain dicts (the flow.xml analog). Each entry:
        {"name", "kind", "upstream"|"upstreams", and per kind:
        source: "ds" (registry key) · stage: "fn" (registry key) +
        optional "options" (map_batches kwargs) · filter: "predicate"
        (expr string, or registry key when prefixed "@") · sink:
        "consume" (registry key)}. Callables come ONLY from
        ``registry`` — config stays declarative data."""
        f = cls(cache_fanout=cache_fanout)
        for e in spec:
            kind, name = e["kind"], e["name"]
            if kind == "source":
                f.source(name, registry[e["ds"]])
            elif kind == "stage":
                f.stage(name, e["upstream"], registry[e["fn"]], **e.get("options", {}))
            elif kind == "filter":
                p = e["predicate"]
                f.filter(name, e["upstream"],
                         registry[p[1:]] if isinstance(p, str) and p.startswith("@") else p)
            elif kind == "union":
                f.union(name, e["upstreams"])
            elif kind == "sink":
                f.sink(name, e["upstream"], registry[e["consume"]])
            else:
                raise ValueError(f"unknown kind {kind!r} for node {name!r}")
        return f
