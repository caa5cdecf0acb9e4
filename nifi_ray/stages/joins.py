"""Temporal and interval joins — as-of join and range(interval) lookup.

NiFi 1.1.2 has no relational join (SURVEY.md §2.7); its join-shaped
enrichers fetch the dimension value that was CURRENT for a record:
- GeoEnrichIP (nifi-enrich-bundle/.../GeoEnrichIP.java) — IP → the
  range of a MaxMind interval table that contains it = range join.
- FetchDistributedMapCache (FetchDistributedMapCache.java) at event
  time — the keyed dimension value as-of the record's timestamp =
  as-of join (the reference approximates it with whatever the cache
  holds NOW; a replayable engine must use event time).

Both are BROADCAST implementations: the dimension side (rates, geo
ranges, configs) is MBs — ``ray.put`` once, resolved once per actor in
``__init__``, one vectorized ``np.searchsorted`` per batch. No shuffle.
For a dimension too big to broadcast, apply the same searchsorted
inside ``groupby(key).map_groups`` after co-partitioning both sides by
key — the partitioning assumption is key-disjointness, identical to the
CDC apply's (pipelines/cdc.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


class AsofLookup:
    """Actor-pool stage: for each row, append the dimension row with the
    greatest ``dim_ts <= ts`` within the same key (backward as-of join,
    DuckDB/pandas ``merge_asof`` semantics; rows before the first
    dimension entry of their key get nulls).

    Vectorized across the whole batch: dimension keys are factorized to
    dense ids, both sides' timestamps are offset into per-key disjoint
    composite ranges, and ONE ``np.searchsorted`` over the composite
    array resolves every row.

        dim_ref = ray.put(rates)   # pa.Table(key, ts, ...values)
        ds.map_batches(AsofLookup, fn_constructor_args=(dim_ref, "user_id", "ts", "region", "ts"),
                       batch_format="pyarrow", concurrency=4)
    """

    def __init__(
        self,
        dim_ref,
        key_col: str,
        ts_col: str,
        dim_key: str | None = None,
        dim_ts: str | None = None,
        columns: list[str] | None = None,
    ):
        dim: pa.Table = ray.get(dim_ref) if isinstance(dim_ref, ray.ObjectRef) else dim_ref
        self.key_col, self.ts_col = key_col, ts_col
        dim_key, dim_ts = dim_key or key_col, dim_ts or ts_col
        dim = dim.sort_by([(dim_key, "ascending"), (dim_ts, "ascending")]).combine_chunks()
        self.columns = columns or [
            n for n in dim.schema.names if n not in (dim_key, dim_ts)
        ]
        self.dim = dim
        self.dim_keys = dim[dim_key].combine_chunks()  # sorted unique-able
        kd = self.dim_keys.dictionary_encode()
        self.key_values = kd.dictionary  # distinct keys, first-appearance = sorted
        k_idx = kd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ts = self._ts_i64(dim[dim_ts])
        # per-key composite: k_idx * span + (ts - lo). span covers every
        # ts either side can present (int64 µs fits: keys < 2^20, span < 2^43)
        self.lo = int(ts.min()) if len(ts) else 0
        self.span = (int(ts.max()) - self.lo + 2) if len(ts) else 2
        self.composite = k_idx * self.span + (ts - self.lo)

    @staticmethod
    def _ts_i64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
        if pa.types.is_timestamp(col.type):
            col = pc.cast(col, pa.int64())
        return col.to_numpy(zero_copy_only=False).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch[self.key_col], value_set=self.key_values)
        known = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        k_idx = (
            pc.fill_null(pc.cast(idx, pa.int64()), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ts = self._ts_i64(batch[self.ts_col])
        # clamp into the key's composite range so an out-of-range ts
        # still resolves within its own key's slice
        off = np.clip(ts - self.lo, 0, self.span - 1)
        comp = k_idx * self.span + off
        pos = np.searchsorted(self.composite, comp, side="right") - 1
        # valid = found a dim row of the SAME key at or before ts
        valid = known & (pos >= 0) & (self.composite[np.clip(pos, 0, None)] // self.span == k_idx)
        # rows whose real ts predates the key's first entry: searchsorted
        # already lands them in the previous key (invalidated above) or
        # at clamp 0 — recheck true ts against the matched dim ts
        matched_ts = np.where(valid, self.composite[np.clip(pos, 0, None)] % self.span + self.lo, 0)
        valid &= ts >= matched_ts
        take = pa.array(
            np.where(valid, np.clip(pos, 0, None), -1), pa.int64()
        )
        take = pc.if_else(pc.equal(take, pa.scalar(-1, pa.int64())), pa.scalar(None, pa.int64()), take)
        for c in self.columns:
            batch = batch.append_column(c, self.dim[c].take(take))
        return batch


class RangeLookup:
    """Actor-pool stage: map a numeric column into the interval of a
    broadcast range table that contains it (GeoEnrichIP's
    IP-in-CIDR-range lookup shape). ``ranges`` is a pa.Table with a
    sorted ``lo`` column (interval = [lo_i, lo_{i+1}) with an optional
    explicit ``hi`` on the last/all rows); label columns are appended,
    null when the value falls outside every interval.

        ranges = pa.table({"lo": [...], "hi": [...], "n_name": [...]})
        ds.map_batches(RangeLookup, fn_constructor_args=(ray.put(ranges), "ip"),
                       batch_format="pyarrow", concurrency=4)
    """

    def __init__(self, ranges_ref, col: str, columns: list[str] | None = None):
        r: pa.Table = (
            ray.get(ranges_ref) if isinstance(ranges_ref, ray.ObjectRef) else ranges_ref
        )
        r = r.sort_by("lo").combine_chunks()
        self.col = col
        self.lo = r["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.hi = (
            r["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
            if "hi" in r.schema.names
            else np.append(self.lo[1:], np.iinfo(np.int64).max)
        )
        self.ranges = r
        self.columns = columns or [
            n for n in r.schema.names if n not in ("lo", "hi")
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = batch[self.col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(self.lo, v, side="right") - 1
        cl = np.clip(pos, 0, None)
        valid = (pos >= 0) & (v < self.hi[cl])
        take = pa.array(np.where(valid, cl, -1), pa.int64())
        take = pc.if_else(
            pc.equal(take, pa.scalar(-1, pa.int64())), pa.scalar(None, pa.int64()), take
        )
        for c in self.columns:
            batch = batch.append_column(c, self.ranges[c].take(take))
        return batch


def lookup_join(left, right, left_key: str, right_key: str, how: str = "inner"):
    """Distributed equi-join for a UNIQUE-keyed right side, built on a
    sort exchange (``groupby().map_groups``) instead of ``Dataset.join``.

    Why not the native hash join here: Ray 2.49's hash-join aggregator
    hands Acero a SCHEMA-LESS table for any hash partition that received
    zero rows, and Acero rejects it ("No match or multiple matches for
    key field reference …"). Empty partitions are guaranteed whenever
    the cluster-derived partition count exceeds the number of live keys
    — i.e. precisely on the sparse exchanges (candidate pairs, label
    propagation) this helper serves. The sort exchange has no empty-
    partition failure mode; schema-less empties it emits are stripped.

    Semantics: each left row gains the right row's non-key columns where
    ``left[left_key] == right[right_key]``; ``how='inner'`` drops left
    rows with no match, ``how='left'`` null-fills them. The right side
    must be unique per key (duplicate right rows would demand a cross
    product — assert-guarded per group).
    """
    from ..util.io import drop_schemaless_empties

    lschema = left.schema()
    rschema = right.schema()
    lnames = list(lschema.names)
    rpayload = [n for n in rschema.names if n != right_key]
    overlap = set(lnames) & set(rpayload)
    if overlap:
        raise ValueError(f"lookup_join: overlapping non-key columns {overlap}")
    key_t = lschema.types[lnames.index(left_key)]
    out_fields = (
        [(n, lschema.types[lnames.index(n)]) for n in lnames]
        + [(n, rschema.types[list(rschema.names).index(n)]) for n in rpayload]
    )
    uni = pa.schema(
        [pa.field("__k", key_t), pa.field("__side", pa.int8())]
        + [pa.field(n, t) for n, t in out_fields]
    )

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {"__k": t[left_key].cast(key_t),
                "__side": pa.array(np.ones(t.num_rows, np.int8))}
        for n, typ in out_fields:
            cols[n] = t[n].cast(typ) if n in t.schema.names else pa.nulls(
                t.num_rows, typ)
        return pa.table(cols, schema=uni)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {"__k": t[right_key].cast(key_t),
                "__side": pa.array(np.zeros(t.num_rows, np.int8))}
        for n, typ in out_fields:
            cols[n] = t[n].cast(typ) if n in t.schema.names else pa.nulls(
                t.num_rows, typ)
        return pa.table(cols, schema=uni)

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    out_schema = pa.schema([pa.field(n, t) for n, t in out_fields])

    def attach(g: pa.Table) -> pa.Table:
        rrows = g.filter(pc.equal(g["__side"], 0))
        lrows = g.filter(pc.equal(g["__side"], 1))
        if lrows.num_rows == 0:
            return out_schema.empty_table()
        if rrows.num_rows == 0:
            if how == "inner":
                return out_schema.empty_table()
            return pa.table(
                {n: lrows[n] if n in lschema.names else pa.nulls(
                    lrows.num_rows, t) for n, t in out_fields},
                schema=out_schema,
            )
        assert rrows.num_rows == 1, (
            f"lookup_join: right side not unique on {right_key!r} "
            f"(key {g['__k'][0].as_py()!r} has {rrows.num_rows} rows)"
        )
        cols = {}
        for n, t in out_fields:
            if n in lschema.names:
                cols[n] = lrows[n]
            else:
                v = rrows[n][0]
                cols[n] = pa.array([v.as_py()] * lrows.num_rows, t)
        return pa.table(cols, schema=out_schema)

    return drop_schemaless_empties(
        both.groupby("__k").map_groups(attach, batch_format="pyarrow")
    )


# ---------------------------------------------------------------- bloom join


def _key_hashes(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """u64 hashes of a string or integer join-key column (nulls dropped
    — a null key matches nothing in an equi-join)."""
    from ..util.hashing import crc32_of_strings, mix_u64

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.drop_null()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return mix_u64(crc32_of_strings(col).astype(np.uint64))
    return mix_u64(col.to_numpy(zero_copy_only=False).astype(np.uint64))


def bloom_semijoin_filter(
    probe,
    build,
    probe_key: str,
    build_key: str,
    *,
    n_items_hint: int,
    fp_rate: float = 0.01,
):
    """Bloom-prefiltered semi-join: drop probe rows whose key cannot
    exist on the (already filtered) build side BEFORE any join shuffle.

    The standard engine trick (Spark's "bloom join" / runtime filter;
    absent from both NiFi and Ray Data): when a selective predicate
    shrinks the build side, most probe rows will never find a partner,
    yet a plain ``Dataset.join`` still ships every one of them through
    the all-to-all exchange. Instead:

    1. per-block Bloom partials over ``build[build_key]`` — each block
       reduces to ONE fixed-size bit-array row (geometry fixed up front
       from ``n_items_hint``/``fp_rate`` so partials are mergeable by
       bitwise OR, exactly like the HLL register merge);
    2. driver ORs the tiny partials (one per block) and ``ray.put``s
       the merged filter ONCE;
    3. ``probe`` is filtered in ``map_batches`` with the vectorized
       early-exit probe (`BloomFilter.contains_hashes`).

    False positives only let extra probe rows through — the real join
    afterwards removes them, so the END RESULT IS EXACT at any
    ``fp_rate``; false negatives are impossible (same hash pipeline on
    both sides). At 100 TB this turns "shuffle 100 TB of probe rows"
    into "broadcast ~1.2 MB per 10^6 build keys, shuffle only matches".

    Returns the filtered probe Dataset (lazy; same schema).
    """
    from .bloom import BloomFilter

    geom = BloomFilter(n_items_hint, fp_rate)
    m_bits, k, n_words = geom.m_bits, geom.k, geom.words.size

    def partial(t: pa.Table) -> pa.Table:
        bf = BloomFilter(n_items_hint, fp_rate)
        assert bf.m_bits == m_bits and bf.k == k  # mergeable geometry
        h = _key_hashes(t[build_key])
        if h.size:
            bf.add_hashes(np.unique(h))
        return pa.table({"words": pa.array([bf.words.tobytes()], pa.binary())})

    rows = build.select_columns([build_key]).map_batches(
        partial, batch_format="pyarrow"
    ).take_all()
    merged = BloomFilter(n_items_hint, fp_rate)
    for r in rows:
        merged.words |= np.frombuffer(r["words"], np.uint64)

    # ship the bit array through the object store ONCE (zero-copy numpy
    # read in every task); the probe stage is an actor pool so the
    # filter object is rebuilt once per actor, not once per batch
    ref = ray.put(merged.words)

    return probe.map_batches(
        BloomKeyFilter,
        fn_constructor_args=(ref, probe_key, n_items_hint, fp_rate),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


class BloomKeyFilter:
    """Actor-pool probe stage for :func:`bloom_semijoin_filter` — the
    merged Bloom words deref once per actor in ``__init__``."""

    def __init__(self, words_ref, probe_key: str, n_items_hint: int,
                 fp_rate: float):
        from .bloom import BloomFilter

        self.bf = BloomFilter(n_items_hint, fp_rate)
        words = ray.get(words_ref) if isinstance(
            words_ref, ray.ObjectRef) else words_ref
        self.bf.words = np.asarray(words, np.uint64)
        self.key = probe_key

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t[self.key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # null keys never match: hash a null-filled copy, then force
        # those rows out with the validity mask
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        h = _key_hashes(pc.fill_null(col, "" if pa.types.is_string(
            col.type) or pa.types.is_large_string(col.type) else 0))
        mask = self.bf.contains_hashes(h) & valid
        return t.filter(pa.array(mask))
