"""Connected components over a pair/edge Dataset — near-dup GROUPS.

The MinHash/SimHash pipelines end at verified pairs (a, b); dedup
policy needs components ("keep the smallest doc_id of each duplicate
cluster"). Distributed min-label propagation (the standard iterative
construction, e.g. the 'hash-to-min' family from the MapReduce
connected-components literature):

    label(v) ← min(label(v), min over neighbours' labels)

iterated via groupby until fixpoint. Each round shuffles only
(node, label) pairs — never payloads. Converges in O(diameter) rounds;
near-dup clusters are tiny cliques, so 2-3 rounds in practice; the
loop stops on a no-change round, with a bounded max.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def connected_components(pairs, max_rounds: int = 10):
    """pairs: Dataset of {a, b} string/int edges. Returns Dataset of
    {node, component} where component = min node id reachable.

    Driver-side iteration over a small (node, label) table: the label
    table is ≤ the number of DISTINCT nodes appearing in any verified
    duplicate pair — orders of magnitude smaller than the corpus, so
    materializing it on the driver is the documented scale assumption
    (for corpus-scale components, swap the pandas step for a
    groupby-aggregate Dataset round; semantics identical).
    """
    import pandas as pd

    edges = pairs.to_pandas()
    if len(edges) == 0:
        return pd.DataFrame({"node": [], "component": []})
    # undirected: duplicate both directions
    fwd = edges.rename(columns={"a": "u", "b": "v"})
    rev = edges.rename(columns={"a": "v", "b": "u"})
    e = pd.concat([fwd, rev], ignore_index=True)
    label = pd.Series(
        index=pd.unique(pd.concat([e["u"], e["v"]])), dtype=object
    )
    label[:] = label.index
    for _ in range(max_rounds):
        neigh = e.assign(nl=label[e["v"]].values).groupby("u")["nl"].min()
        new = label.copy()
        upd = neigh[neigh < label[neigh.index]]
        if len(upd) == 0:
            break
        new[upd.index] = upd
        label = new
    out = pd.DataFrame({"node": label.index, "component": label.values})
    return out.sort_values("node").reset_index(drop=True)


def dedup_keep_component_min(ds, pairs, id_col: str):
    """Drop every row whose id is in a duplicate component but is not
    the component's minimum (DetectDuplicate policy over near-dup
    groups): broadcast the drop-set, anti-join filter."""
    import ray

    comp = connected_components(pairs)
    drop = set(comp.loc[comp["node"] != comp["component"], "node"].tolist())
    drop_ref = ray.put(drop)

    def fn(batch: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        if not d:
            return batch
        mask = pc.invert(
            pc.is_in(batch[id_col], value_set=pa.array(list(d), batch[id_col].type))
        )
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")
