"""Broadcast-small-side lookups: membership scans and enrichment joins.

NiFi has no relational join (SURVEY.md §2.7); its join-like operators
are dictionary/membership lookups against a shared resource:
- ScanAttribute / ScanContent — term-dictionary membership routing
  (reference nifi-standard-processors/.../standard/ScanAttribute.java,
  ScanContent.java)
- ReplaceTextWithMapping — mapping-file substitution
  (ReplaceTextWithMapping.java)
- FetchDistributedMapCache / GeoEnrichIP — K-V / MaxMind enrichment
  (FetchDistributedMapCache.java; nifi-enrich-bundle/.../GeoEnrichIP.java)

Ray-Data-first: the small side is ``ray.put`` ONCE and read inside each
task/actor — never re-shipped per batch, never shuffled. Semi/anti join
is a vectorized ``pc.is_in`` mask; enrichment is a dictionary-encoded
take against the broadcast table.
"""

from __future__ import annotations

from typing import Iterable

import pyarrow as pa
import pyarrow.compute as pc

import ray


def scan_filter(col: str, terms: Iterable[str] | ray.ObjectRef, invert: bool = False):
    """Semi (or anti, invert=True) join against a broadcast term set.
    ``terms`` may be a ray.ObjectRef (ray.put of a list/set) — resolved
    once per task closure, not per batch."""
    resolved: dict = {}

    def fn(batch: pa.Table) -> pa.Table:
        if "vs" not in resolved:
            t = ray.get(terms) if isinstance(terms, ray.ObjectRef) else terms
            resolved["vs"] = pa.array(sorted(set(t)))
        mask = pc.is_in(batch[col], value_set=resolved["vs"])
        if invert:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return fn


class BroadcastEnrich:
    """Actor-pool stage: left-join a broadcast dimension table into each
    batch (GeoEnrichIP / FetchDistributedMapCache analog). The dimension
    table is fetched from the object store ONCE per actor in __init__.

        dim_ref = ray.put(nation_table)  # pa.Table, small side
        ds.map_batches(BroadcastEnrich, fn_constructor_args=(dim_ref, "c_nationkey", "n_nationkey"),
                       batch_format="pyarrow", concurrency=4)
    """

    def __init__(self, dim_ref, left_key: str, right_key: str, columns: list[str] | None = None):
        dim: pa.Table = ray.get(dim_ref) if isinstance(dim_ref, ray.ObjectRef) else dim_ref
        self.right_key = right_key
        self.left_key = left_key
        self.dim = dim.sort_by(right_key).combine_chunks()
        self.keys = self.dim[right_key]
        self.columns = columns or [n for n in self.dim.schema.names if n != right_key]

    def __call__(self, batch: pa.Table) -> pa.Table:
        # position of each left key in the sorted dim keys (or null)
        idx = pc.index_in(batch[self.left_key], value_set=self.keys.combine_chunks())
        for c in self.columns:
            batch = batch.append_column(c, self.dim[c].take(idx))
        return batch


def enrich_fn(dim_ref, left_key: str, right_key: str, columns: list[str] | None = None):
    """Stateless-task variant of BroadcastEnrich (resolves the broadcast
    ref once per closure instance, i.e. once per task)."""
    state: dict = {}

    def fn(batch: pa.Table) -> pa.Table:
        if "e" not in state:
            state["e"] = BroadcastEnrich(dim_ref, left_key, right_key, columns)
        return state["e"](batch)

    return fn
