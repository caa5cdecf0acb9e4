"""The flagship pipeline: CDC replay into a versioned Parquet lake.

Dataflow per tick:

    read events (lsn filter pushed to row groups; fully-applied files
                 skipped via footer stats — sources/binlog.py)
      → premerge        stateless zero-copy Arrow: drop applied lsns,
                        stamp partition_id (vectorized CRC32),
                        batch-local LWW collapse (the skew absorber)
      → ONE all-to-all exchange, two implementations:
          direct (default): raw-task map/apply — map tasks scatter ≤
              NIFI_RAY_MAX_SHARDS grouped partition shards
              (num_returns=G), apply tasks consume exactly their
              group's shards; one object-store write + read per byte;
              measured 2.5-3x over the Dataset hash shuffle
          dataset: map_batches → repartition(P, keys=[partition_id])
              under HASH shuffle (never a sort — token payloads are
              not order-carrying) → map_batches(apply)
      → apply, two modes:
          cow (default): read base partition, vectorized LWW merge,
              rewrite the partition part file (deterministic name →
              idempotent retries)
          delta: write ONLY the collapsed events (incl. tombstones) as
              a per-tick delta part — O(delta) bytes; readers overlay
              deltas by LWW (merge-on-read) and compact() folds them
    driver merges per-partition stats into the manifest and commits
    atomically (phase 2 of the two-phase commit).

Exactly-once: part files are phase 1; the manifest rename is phase 2.
A retried task overwrites its own deterministic file; a crash before
commit leaves orphans readers never see and gc_orphans removes
(SURVEY.md §7.5). verify() recomputes per-partition checksums against
the manifest (site-to-site CRC confirmation analog). NiFi analogs
cited in state/manifest.py and stages/lww.py.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass
from typing import Any, Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from ..schema import BASE_SCHEMA, base_fields_of
from ..stages.evolve import conform, unify
from ..stages.lww import collapse_last_writer, merge_into_base
from ..state.manifest import (
    CommitConflict,
    Manifest,
    append_lineage,
    commit_manifest,
    load_manifest,
    manifest_path,
    part_file,
    partition_dir,
    publish_part,
)
from ..util.hashing import (
    HASH_REV,
    add_partition_column,
    partition_of,
    state_checksum,
)

_EVENT_META_COLS = ("lsn", "op", "doc_id")


def _limit_arrow_threads(n: int = 1, io: int = 2) -> None:
    """Cap pyarrow's per-process thread pools inside Ray workers.

    pyarrow sizes its compute/IO pools to the HOST's cores, ignoring
    Ray's num_cpus — so 32 one-CPU tasks each spawn 32 Arrow threads
    (1024 threads thrashing one box), and a "4 CPU" session silently
    borrows the whole machine, corrupting any scaling measurement.
    One compute thread per 1-CPU task is the honest (and faster —
    no oversubscription) configuration. Idempotent per worker."""
    import pyarrow as _pa

    if _pa.cpu_count() != n:
        _pa.set_cpu_count(n)
    if _pa.io_thread_count() != io:
        _pa.set_io_thread_count(io)


def _use_hash_shuffle(ds):
    """Switch THIS dataset's captured DataContext to hash shuffle.

    The partition apply needs co-location by partition_id, NOT a sort:
    ``repartition(P, keys=[...])`` under HASH_SHUFFLE moves each row
    once by hash — measured ~4x faster than the default sort-based
    groupby shuffle on list-payload rows (sorting token arrays is pure
    waste; order is re-established per partition locally). The strategy
    is flipped on the dataset's own context copy (Ray plans against it),
    leaving the global DataContext — and other pipelines' groupbys —
    untouched."""
    from ray.data.context import ShuffleStrategy

    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # By default Ray reserves min(1, totalCPU/2/P) CPUs per partition for
    # the shuffle aggregator actors — at P≈CPU count that's HALF the
    # cluster parked on buffering actors, starving the map/apply tasks
    # (measured 3x replay slowdown at 32 CPUs). The aggregators are
    # I/O-bound concatenators; a nominal reservation is plenty.
    ds.context.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.05
    return ds


_VALID_OPS = pa.array(["I", "U", "D"])


def _validate_events(t: pa.Table) -> tuple[pa.Table, pa.Table]:
    """Split an event batch into (valid, quarantined): an event is
    quarantined when it cannot be applied AT ALL — null doc_id (no key),
    null lsn (no position in the log), or an op outside I/U/D. The NiFi
    'failure' relationship: malformed records are routed, counted, and
    kept inspectable — never silently dropped, never poisoning the tick
    (reference nifi-api/.../Relationship.java + every standard
    processor's REL_FAILURE)."""
    bad = pc.is_null(t["doc_id"])
    bad = pc.or_(bad, pc.is_null(t["lsn"]))
    bad = pc.or_(
        bad, pc.invert(pc.is_in(t["op"].combine_chunks(), value_set=_VALID_OPS))
    )
    if not pc.any(bad).as_py():
        return t, t.schema.empty_table()
    return t.filter(pc.invert(bad)), t.filter(bad)


def _write_quarantine(quarantine_dir: str, bad: pa.Table) -> str:
    """Write quarantined rows as a CONTENT-addressed parquet part —
    q-{md5(rows)}.parquet — so a retried task (or a re-replay of a
    not-yet-watermarked file) rewrites the same file instead of
    duplicating rows. Atomic rename, same protocol as data parts."""
    import hashlib
    import io as _io

    sink = _io.BytesIO()
    pq.write_table(bad.replace_schema_metadata(None), sink)
    name = f"q-{hashlib.md5(sink.getvalue()).hexdigest()[:16]}.parquet"
    os.makedirs(quarantine_dir, exist_ok=True)
    out = os.path.join(quarantine_dir, name)
    tmp = out + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(sink.getvalue())
    os.replace(tmp, out)
    return out


def _quarantine_row_count(quarantine_dir: str) -> int:
    """Total quarantined rows (footer metadata only, no data read)."""
    if not os.path.isdir(quarantine_dir):
        return 0
    return sum(
        pq.read_metadata(os.path.join(quarantine_dir, f)).num_rows
        for f in os.listdir(quarantine_dir)
        if f.endswith(".parquet")
    )


def _premerge_fn(num_partitions: int, applied_through: int, quarantine_dir: str | None = None):
    """Stateless map_batches body for the pre-shuffle stage."""

    def premerge(batch: pa.Table) -> pa.Table:
        batch, bad = _validate_events(batch)
        if bad.num_rows and quarantine_dir:
            _write_quarantine(quarantine_dir, bad)
        if applied_through > 0:
            batch = batch.filter(pc.greater(batch["lsn"], applied_through))
        # drop file-level schema metadata (e.g. pandas dicts): Ray's
        # hash-shuffle schema-dedup cache can't hash it and warns on
        # every reduce task, burying real signals in the logs
        batch = batch.replace_schema_metadata(None)
        batch = add_partition_column(batch, num_partitions)
        return collapse_last_writer(batch, count_col="ev_count")

    return premerge


def _apply_partition_fn(
    lake_dir: str,
    base_files: dict[int, dict],
    target_schema_b64: bytes,
    next_version: int,
    applied_through: int,
    tick_token: str | None = None,
):
    """map_groups body: apply one partition's collapsed events.

    Pure function of (inputs, lake files) — retried tasks rewrite the
    same deterministic output file, so retries are idempotent.
    """
    target_schema = pa.ipc.read_schema(pa.BufferReader(target_schema_b64))

    def apply_block(block: pa.Table) -> pa.Table:
        """A hash-repartitioned block holds ALL rows of one or more
        partition_ids (each partition entirely in one block). Apply each
        contained partition independently."""
        pids = pc.unique(block["partition_id"]).to_pylist()
        outs = []
        for pid in sorted(pids):
            group = block.filter(pc.equal(block["partition_id"], pid))
            outs.append(apply_partition(group))
        if not outs:
            return _STATS_SCHEMA.empty_table()
        return pa.concat_tables(outs)

    def apply_partition(group: pa.Table) -> pa.Table:
        k = int(group["partition_id"][0].as_py())
        if "ev_count" not in group.schema.names:  # direct-apply path
            group = group.append_column(
                "ev_count", pa.array(np.ones(group.num_rows, dtype=np.int64))
            )
        events_in = int(pc.sum(group["ev_count"]).as_py() or 0)
        # guard against replayed rows that slipped past the read filter
        group = group.filter(pc.greater(group["lsn"], applied_through))
        events_live = int(pc.sum(group["ev_count"]).as_py() or 0)
        dups_dropped = events_in - events_live
        # collapse across batches (associative with the batch-local one)
        group = collapse_last_writer(group, count_col="ev_count")
        max_lsn = int(pc.max(group["lsn"]).as_py()) if group.num_rows else 0

        entry = base_files.get(k)
        if entry is not None:
            base = pq.read_table(os.path.join(lake_dir, entry["file"]))
            if entry.get("deltas"):
                # a COW tick on a merge-on-read lake folds the live
                # delta parts in as part of its base — otherwise the
                # rewrite would silently revert every doc the deltas
                # updated to its last-compacted image (data loss)
                base = _merge_partition(
                    base,
                    [
                        pq.read_table(os.path.join(lake_dir, d))
                        for d in entry["deltas"]
                    ],
                    target_schema,
                )
        else:
            base = target_schema.empty_table()
        if not base.schema.equals(target_schema):
            base = conform(base, target_schema)

        ev_payload_names = [n for n in group.schema.names if n != "partition_id"]
        events = conform(group.select(ev_payload_names), _event_target(target_schema))
        n_deletes = int(pc.sum(pc.equal(events["op"], "D")).as_py() or 0)
        merged = merge_into_base(base, events).sort_by("doc_id")
        merged = conform(merged, target_schema)

        rel = part_file(k, next_version, tick_token)
        out = os.path.join(lake_dir, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        tmp = out + f".tmp.{os.getpid()}"
        pq.write_table(merged, tmp, compression="zstd")
        publish_part(tmp, out)

        return pa.table(
            {
                "partition_id": pa.array([k], pa.int32()),
                "file": pa.array([rel]),
                "rows": pa.array([merged.num_rows], pa.int64()),
                "max_lsn": pa.array([max_lsn], pa.int64()),
                "token_hash": pa.array([state_checksum(merged)], pa.uint64()),
                "events_applied": pa.array([events_live], pa.int64()),
                "events_in": pa.array([events_in], pa.int64()),
                "dups_dropped": pa.array([dups_dropped], pa.int64()),
                "deletes": pa.array([n_deletes], pa.int64()),
                "bytes_written": pa.array([os.path.getsize(out)], pa.int64()),
            },
            schema=_STATS_SCHEMA,
        )

    return apply_block


@ray.remote
def _cdc_map_task(
    files: list[str],
    P: int,
    lo: int,
    lsn_hi: int | None,
    G: int | None = None,
    quarantine_dir: str | None = None,
) -> tuple:
    """Direct-exchange map side: read events (row-group filter pushdown),
    premerge (validate/quarantine + dedup + partition stamp + LWW
    collapse), split into G grouped shards (G = P when ungrouped)
    returned as separate objects. Pure → retryable (quarantine parts are
    content-addressed, so a retry rewrites rather than duplicates).

    The lsn row filter silently drops NULL-lsn rows at read time, so
    those are recovered separately: files whose footer reports lsn
    nulls (metadata check only — zero cost on clean files) get a second
    is_null-filtered read routed straight to quarantine."""
    _limit_arrow_threads()
    filters = [("lsn", ">", lo)]
    if lsn_hi is not None:
        filters.append(("lsn", "<=", lsn_hi))
    tables = [pq.read_table(f, filters=filters) for f in files]
    if quarantine_dir:
        null_lsn = []
        for f in files:
            md = pq.read_metadata(f)
            ci = md.schema.to_arrow_schema().get_field_index("lsn")
            if ci < 0:
                continue
            if any(
                (md.row_group(rg).column(ci).statistics is None)
                or (md.row_group(rg).column(ci).statistics.null_count or 0) > 0
                for rg in range(md.num_row_groups)
            ):
                import pyarrow.dataset as pads

                bad = pads.dataset(f).to_table(filter=pc.field("lsn").is_null())
                if bad.num_rows:
                    null_lsn.append(bad)
        if null_lsn:
            _write_quarantine(
                quarantine_dir,
                pa.concat_tables(null_lsn, promote_options="permissive"),
            )
    t = pa.concat_tables(tables, promote_options="permissive").combine_chunks()
    t = _premerge_fn(P, lo, quarantine_dir)(t)
    return _scatter_by_partition(t, P, G)


def _scatter_by_partition(t: pa.Table, P: int, G: int | None = None):
    """Sort by partition code and slice into G shard tables (group g
    holds the contiguous pid range [g·P/G, (g+1)·P/G) — the apply task
    splits pids locally). This is the grouped-shard fallback for large
    P: a map task returns G objects, not P, so P = 100k partitions
    costs 512 returns per task, not 100k. With num_returns=1 Ray hands
    the WHOLE return value to the single ref, so G==1 must return the
    bare table (not a 1-tuple)."""
    G = P if G is None else min(G, P)
    if G == 1:
        return t
    codes = t["partition_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(codes, kind="stable")
    s = t.take(pa.array(order))
    group_lo = np.linspace(0, P, G + 1).astype(np.int64)
    bounds = np.searchsorted(codes[order], group_lo)
    return tuple(
        s.slice(int(bounds[g]), int(bounds[g + 1] - bounds[g])) for g in range(G)
    )


@ray.remote
def _rescale_map_task(files: list[str], P: int) -> tuple:
    _limit_arrow_threads()
    tables = [pq.read_table(f) for f in files]
    t = pa.concat_tables(tables, promote_options="permissive").combine_chunks()
    t = add_partition_column(t, P)
    return _scatter_by_partition(t, P)


@ray.remote
def _rescale_write_task(
    lake_dir: str, schema_b64: bytes, version: int, k: int,
    tick_token: str | None, *shards: pa.Table
) -> dict | None:
    from ..stages.evolve import conform as _conform

    _limit_arrow_threads()
    parts = [s for s in shards if s.num_rows]
    schema = pa.ipc.read_schema(pa.BufferReader(schema_b64))
    if parts:
        t = pa.concat_tables(parts, promote_options="permissive")
        t = _conform(t.drop_columns(["partition_id"]).sort_by("doc_id"), schema)
    else:
        t = schema.empty_table()
    rel = part_file(k, version, tick_token)
    out = os.path.join(lake_dir, rel)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    tmp = out + f".tmp.{os.getpid()}"
    pq.write_table(t, tmp, compression="zstd")
    publish_part(tmp, out)
    return {
        "partition_id": k,
        "file": rel,
        "rows": t.num_rows,
        "token_hash": state_checksum(t),
    }


@ray.remote
def _cdc_apply_task(
    lake_dir: str,
    base_files: dict,
    schema_b64: bytes,
    next_version: int,
    lo: int,
    tick_token: str | None,
    *shards: pa.Table,
) -> list[dict]:
    """Direct-exchange apply side: merge this partition's shards into its
    base file, write the COW part (deterministic name → idempotent)."""
    _limit_arrow_threads()
    parts = [s for s in shards if s.num_rows]
    if not parts:
        return []
    t = pa.concat_tables(parts, promote_options="permissive")
    apply_block = _apply_partition_fn(
        lake_dir, base_files, schema_b64, next_version, lo, tick_token
    )
    return apply_block(t).to_pylist()


def _merge_partition(
    base: pa.Table, deltas: list[pa.Table], schema: pa.Schema
) -> pa.Table:
    """Merge-on-read kernel: overlay delta parts (collapsed events incl.
    tombstones, disjoint ascending LSN ranges) onto a base partition by
    LWW. Same math as the apply path, so compaction and read agree."""
    if not deltas:
        return conform(base, schema) if not base.schema.equals(schema) else base
    ev = pa.concat_tables(deltas, promote_options="permissive")
    ev = collapse_last_writer(ev)
    if not base.schema.equals(schema):
        base = conform(base, schema)
    ev = conform(ev, _event_target(schema))
    return conform(merge_into_base(base, ev).sort_by("doc_id"), schema)


def _diff_snapshots(old: pa.Table, new: pa.Table, key: str = "doc_id") -> pa.Table:
    """Snapshot-diff kernel for the change feed: two ≤1-row-per-key
    state tables (same schema) → one row per CHANGED key:

        change_op 'I'  key in new only          (new image)
        change_op 'U'  key in both, image differs (new image)
        change_op 'D'  key in old only          (old image — Delta-CDF
                                                 style delete preimage)

    No-op writes (identical image) are excluded by construction — image
    equality is the vectorized order-sensitive row_image_hash over every
    non-key column. All Arrow/numpy kernels; no Python row loop."""
    from ..util.hashing import row_image_hash

    payload_cols = [n for n in new.schema.names if n != key]
    old_ids = old[key].combine_chunks()
    new_ids = new[key].combine_chunks()
    in_old = pc.is_in(new_ids, value_set=old_ids)
    in_new = pc.is_in(old_ids, value_set=new_ids)
    inserts = new.filter(pc.invert(in_old))
    deletes = old.filter(pc.invert(in_new))
    new_c = new.filter(in_old).sort_by(key)
    old_c = old.filter(in_new).sort_by(key)
    if new_c.num_rows:
        differs = row_image_hash(new_c, payload_cols) != row_image_hash(
            old_c, payload_cols
        )
        updates = new_c.filter(pa.array(differs))
    else:
        updates = new_c
    parts = []
    for op, t in (("I", inserts), ("U", updates), ("D", deletes)):
        if t.num_rows:
            parts.append(
                t.add_column(0, "change_op", pa.array([op] * t.num_rows, pa.string()))
            )
    if not parts:
        empty = new.schema.empty_table()
        return empty.add_column(0, "change_op", pa.array([], pa.string()))
    return pa.concat_tables(parts)


@ray.remote
def _cdc_delta_task(
    lake_dir: str,
    schema_b64: bytes,
    next_version: int,
    lo: int,
    tick_token: str | None,
    *shards: pa.Table,
) -> list[dict]:
    """Delta-mode apply side: write ONLY the collapsed events (incl. D
    tombstones) as a per-tick delta part per contained partition —
    O(delta) bytes instead of a full-partition COW rewrite. Handles
    grouped shards (several pids per task); deterministic names →
    idempotent retry."""
    from ..state.manifest import delta_file as _delta_file

    _limit_arrow_threads()
    parts = [s for s in shards if s.num_rows]
    if not parts:
        return []
    block = pa.concat_tables(parts, promote_options="permissive")
    if "ev_count" not in block.schema.names:
        block = block.append_column(
            "ev_count", pa.array(np.ones(block.num_rows, dtype=np.int64))
        )
    schema = pa.ipc.read_schema(pa.BufferReader(schema_b64))
    out_rows: list[dict] = []
    for pid in sorted(pc.unique(block["partition_id"]).to_pylist()):
        k = int(pid)
        t = block.filter(pc.equal(block["partition_id"], pid))
        events_in = int(pc.sum(t["ev_count"]).as_py() or 0)
        t = t.filter(pc.greater(t["lsn"], lo))
        events_live = int(pc.sum(t["ev_count"]).as_py() or 0)
        t = collapse_last_writer(t, count_col="ev_count")
        if t.num_rows == 0:
            continue
        max_lsn = int(pc.max(t["lsn"]).as_py())
        n_deletes = int(pc.sum(pc.equal(t["op"], "D")).as_py() or 0)
        payload = t.drop_columns(
            [c for c in ("partition_id", "ev_count") if c in t.schema.names]
        )
        payload = conform(payload, _event_target(schema))
        rel = _delta_file(k, next_version, tick_token)
        out = os.path.join(lake_dir, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        tmp = out + f".tmp.{os.getpid()}"
        pq.write_table(payload, tmp, compression="zstd")
        publish_part(tmp, out)
        out_rows.append(
            {
                "partition_id": k,
                "delta_file": rel,
                "delta_rows": payload.num_rows,
                "delta_hash": int(state_checksum(payload)),
                "max_lsn": max_lsn,
                "events_applied": events_live,
                "events_in": events_in,
                "dups_dropped": events_in - events_live,
                "deletes": n_deletes,
                "bytes_written": os.path.getsize(out),
            }
        )
    return out_rows


@ray.remote
def _compact_task(
    lake_dir: str,
    base_rel: str | None,
    delta_rels: list[str],
    schema_b64: bytes,
    next_version: int,
    k: int,
    tick_token: str | None = None,
) -> dict:
    """Fold a partition's delta parts into a fresh COW base part."""
    _limit_arrow_threads()
    schema = pa.ipc.read_schema(pa.BufferReader(schema_b64))
    base = (
        pq.read_table(os.path.join(lake_dir, base_rel))
        if base_rel
        else schema.empty_table()
    )
    deltas = [pq.read_table(os.path.join(lake_dir, d)) for d in delta_rels]
    merged = _merge_partition(base, deltas, schema)
    rel = part_file(k, next_version, tick_token)
    out = os.path.join(lake_dir, rel)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    tmp = out + f".tmp.{os.getpid()}"
    pq.write_table(merged, tmp, compression="zstd")
    publish_part(tmp, out)
    return {
        "partition_id": k,
        "file": rel,
        "rows": merged.num_rows,
        "token_hash": state_checksum(merged),
        "bytes_written": os.path.getsize(out),
    }


_STATS_SCHEMA = pa.schema(
    [
        pa.field("partition_id", pa.int32()),
        pa.field("file", pa.string()),
        pa.field("rows", pa.int64()),
        pa.field("max_lsn", pa.int64()),
        pa.field("token_hash", pa.uint64()),
        pa.field("events_applied", pa.int64()),
        pa.field("events_in", pa.int64()),
        pa.field("dups_dropped", pa.int64()),
        pa.field("deletes", pa.int64()),
        pa.field("bytes_written", pa.int64()),
    ]
)


def _event_target(target_schema: pa.Schema) -> pa.Schema:
    """Event-side target schema: CDC bookkeeping + evolved payload."""
    fields = [pa.field("lsn", pa.int64()), pa.field("op", pa.string())]
    fields.extend(f for f in target_schema)
    return pa.schema(fields)


@dataclass
class TickStats:
    version: int
    lo: int
    hi: int
    partitions_touched: int
    events_applied: int
    dups_dropped: int
    rows_total: int
    wall_sec: float
    quarantined: int = 0


def _version_diff_plan(m_old, m_new) -> tuple[list[dict], bool]:
    """Partition-level diff plan between two retained manifests: one
    work item per NEW partition whose manifest entry (base file + delta
    chain) changed — the shared pruning front-end of ``CDCLake.changes``
    and ``matview.refresh_aggregate``.

    Same-P: partitions with byte-identical entries are pruned with ZERO
    file I/O, so a tick that touched 10 of 4096 partitions yields 10
    items. Cross-P (a rescale happened between the versions): entries
    aren't comparable, so every new partition gets an item whose
    ``old_files`` are the congruent old partitions that can hold its
    docs (hash partitioning is stable → doc→partition is congruence-
    structured mod gcd); the consumer must filter old rows to the keys
    the new partition owns (``partition_of(ids, p_new) == k``).
    """
    import math

    p_old, p_new = m_old.num_partitions, m_new.num_partitions
    g = math.gcd(p_old, p_new) or 1
    same_p = p_old == p_new
    items = []
    for k in range(p_new):
        e_new = m_new.partitions.get(k)
        nf = e_new["file"] if e_new else None
        nd = list(e_new.get("deltas", [])) if e_new else []
        suffix = None
        if same_p:
            e_old = m_old.partitions.get(k)
            of_ = [e_old["file"]] if e_old else []
            od = [list(e_old.get("deltas", []))] if e_old else [[]]
            # manifest-level pruning: identical entry → no diff I/O
            if e_old and e_new and e_old["file"] == nf and od[0] == nd:
                continue
            # delta-append fast path: the new entry is the old entry
            # plus appended delta files (a pure merge-on-read tick run).
            # The docs whose image changed are EXACTLY the docs in the
            # suffix deltas — consumers can read O(delta) bytes (suffix
            # + doc_id-IN-filtered old images) instead of diffing two
            # full snapshots. Compaction/COW change the base file and
            # fall back to the full diff.
            if (
                e_old is not None
                and e_new is not None
                and e_old["file"] == nf
                and len(nd) > len(od[0])
                and nd[: len(od[0])] == od[0]
            ):
                suffix = nd[len(od[0]):]
        else:
            js = [j for j in range(p_old) if j % g == k % g and j in m_old.partitions]
            of_ = [m_old.partitions[j]["file"] for j in js]
            od = [list(m_old.partitions[j].get("deltas", [])) for j in js]
        items.append(
            {
                "k": k,
                "new_file": nf,
                "new_deltas": nd,
                "old_files": of_,
                "old_deltas": od,
                "suffix_deltas": suffix,
            }
        )
    return items, same_p


def _suffix_changed_images(
    lake_dir: str, row: dict, schema: pa.Schema
) -> tuple[pa.Table, pa.Table]:
    """O(delta) old/new image extraction for a suffix-shaped diff item
    (``_version_diff_plan`` set ``suffix_deltas``): the changed docs are
    the docs named by the appended delta files. Reads the suffix deltas
    (O(delta) bytes) plus the old snapshot restricted to those doc_ids
    (``doc_id IN`` pushdown — row-group stat/dictionary pruning, the
    same shape as ``CDCLake.lookup``), NEVER two full snapshots.

    Returns (old_sub, new_sub): the changed docs' state images at the
    two versions (insert → absent from old_sub; delete → absent from
    new_sub). No-op writes may appear with identical images in both —
    consumers that subtract contributions (matview, dedup_index) cancel
    them exactly, so no image comparison is needed here."""
    suffix = [
        pq.read_table(os.path.join(lake_dir, d)) for d in row["suffix_deltas"]
    ]
    ev = pa.concat_tables(suffix, promote_options="permissive")
    ev = collapse_last_writer(ev)
    ids = ev["doc_id"].combine_chunks()
    want = ids.to_pylist()
    flt = [("doc_id", "in", want)]
    base = (
        pq.read_table(os.path.join(lake_dir, row["old_files"][0]), filters=flt)
        if row["old_files"]
        else schema.empty_table()
    )
    old_deltas = row["old_deltas"][0] if row["old_deltas"] else []
    parts = [
        pq.read_table(os.path.join(lake_dir, d), filters=flt) for d in old_deltas
    ]
    old_sub = _merge_partition(base, parts, schema)
    live = ev.filter(pc.not_equal(ev["op"], "D"))
    new_sub = conform(live, schema)
    return old_sub, new_sub


class CDCLake:
    """A hash-partitioned, manifest-committed, copy-on-write Parquet lake."""

    def __init__(self, lake_dir: str):
        self.lake_dir = lake_dir

    # ------------------------------------------------------------- init
    def init_from(
        self,
        base: pa.Table | str | list[str] | "ray.data.Dataset",
        num_partitions: int = 16,
    ) -> Manifest:
        """Bootstrap the lake (manifest v1) from a base table.

        Distributed: parquet-file inputs use the direct two-stage
        exchange (same shape as replay/rescale — one object-store write
        and read per byte, no aggregator-actor hop); Table/Dataset
        inputs go through the Dataset hash shuffle.
        """
        import ray.data as rd

        if self.manifest() is not None:
            raise ValueError(
                f"lake already initialized at {self.lake_dir}; use replay() "
                "or point at a fresh directory"
            )
        if isinstance(base, (str, list)):
            from ..sources.binlog import list_event_files

            return self._init_direct(list_event_files(base), num_partitions)
        if isinstance(base, pa.Table):
            ds = rd.from_arrow(base)
        else:
            ds = base

        schema = pa.schema(
            [f for f in ds.schema().base_schema if f.name not in ("lsn", "op")]
        )
        schema_b64 = schema.serialize().to_pybytes()
        lake_dir = self.lake_dir
        os.makedirs(lake_dir, exist_ok=True)

        def write_partition(group: pa.Table, k: int) -> dict:
            tbl = group.drop_columns(["partition_id"]).sort_by("doc_id")
            tbl = conform(tbl, pa.ipc.read_schema(pa.BufferReader(schema_b64)))
            rel = part_file(k, 1)
            out = os.path.join(lake_dir, rel)
            os.makedirs(os.path.dirname(out), exist_ok=True)
            tmp = out + f".tmp.{os.getpid()}"
            pq.write_table(tbl, tmp, compression="zstd")
            publish_part(tmp, out)
            return {
                "partition_id": k,
                "file": rel,
                "rows": tbl.num_rows,
                "token_hash": state_checksum(tbl),
            }

        def write_block(block: pa.Table) -> pa.Table:
            rows = [
                write_partition(
                    block.filter(pc.equal(block["partition_id"], pid)), int(pid)
                )
                for pid in sorted(pc.unique(block["partition_id"]).to_pylist())
            ]
            return pa.Table.from_pylist(
                rows,
                schema=pa.schema(
                    [
                        pa.field("partition_id", pa.int32()),
                        pa.field("file", pa.string()),
                        pa.field("rows", pa.int64()),
                        pa.field("token_hash", pa.uint64()),
                    ]
                ),
            )

        from ..util.io import drop_schemaless_empties

        stats = (
            drop_schemaless_empties(
                _use_hash_shuffle(ds)
                .map_batches(
                    lambda b: add_partition_column(b, num_partitions),
                    batch_format="pyarrow",
                )
                .repartition(num_partitions, keys=["partition_id"])
            )
            .map_batches(write_block, batch_format="pyarrow", batch_size=None)
            .take_all()
        )

        return self._commit_init(num_partitions, schema, stats)

    def _commit_init(self, num_partitions: int, schema: pa.Schema, stats) -> Manifest:
        partitions = {
            int(r["partition_id"]): {
                "file": r["file"],
                "rows": int(r["rows"]),
                "max_lsn": 0,
                "token_hash": int(r["token_hash"]),
                "hash_rev": HASH_REV,
            }
            for r in stats
        }
        m = Manifest(
            version=1,
            num_partitions=num_partitions,
            schema_version=1,
            schema=schema,
            applied_through=0,
            partitions=partitions,
            lineage=[
                {
                    "kind": "INIT",
                    "rows": sum(p["rows"] for p in partitions.values()),
                    "partitions": len(partitions),
                }
            ],
        )
        commit_manifest(self.lake_dir, m)
        return m

    def _init_direct(self, files: list[str], num_partitions: int) -> Manifest:
        """Bootstrap from parquet files via the direct exchange: map
        tasks read+stamp+scatter, one write task per partition."""
        P = num_partitions
        target = None
        for f in files:
            s = pa.schema(
                [fld for fld in pq.read_schema(f) if fld.name not in ("lsn", "op")]
            )
            target = s if target is None else unify(target, s)
        if target is None:
            raise FileNotFoundError("no base files to initialize from")
        target = target.remove_metadata()
        schema_b64 = target.serialize().to_pybytes()
        os.makedirs(self.lake_dir, exist_ok=True)

        ncpu = int(ray.cluster_resources().get("CPU", 8))
        n_maps = max(1, min(len(files), ncpu))
        chunks = [files[i::n_maps] for i in range(n_maps)]
        map_refs = [
            _rescale_map_task.options(num_returns=P).remote(chunk, P)
            for chunk in chunks
        ]
        if P == 1:
            map_refs = [[r] for r in map_refs]
        apply_refs = [
            _rescale_write_task.remote(
                self.lake_dir, schema_b64, 1, k, None,
                *[refs[k] for refs in map_refs],
            )
            for k in range(P)
        ]
        stats = [row for row in ray.get(apply_refs) if row]
        return self._commit_init(num_partitions, target, stats)

    # ------------------------------------------------------------ read
    def manifest(self, version: int | None = None) -> Manifest | None:
        return load_manifest(self.lake_dir, version)

    def read(
        self,
        columns: list[str] | None = None,
        version: int | None = None,
        filters: list[tuple] | None = None,
    ) -> "ray.data.Dataset":
        """Dataset over the lake's committed state.

        ``version``: time travel to an older committed manifest (kept
        until ``expire_versions`` drops it) — the COW layout makes every
        retained version fully readable (Delta-Lake-style snapshot
        isolation; the manifest IS the snapshot).

        ``filters``: parquet-style predicate (tuple DNF, the
        ``pq.read_table(filters=...)`` vocabulary) PUSHED INTO the scan
        — row groups whose column stats exclude the predicate never
        leave storage. On a merge-on-read lake the pushdown stays
        correct under updates that move a doc across the predicate
        boundary: delta rows carry full images and LWW-override base
        rows, so base files scan WITH the pushdown, deltas scan in
        full (they are tick-sized), and the predicate re-applies after
        the overlay (a base row whose doc was updated to a
        non-matching image is dropped; a doc updated INTO the
        predicate appears via its delta image)."""
        import ray.data as rd

        m = self.manifest(version)
        if m is None or not m.partitions:
            raise FileNotFoundError(f"no committed manifest in {self.lake_dir}")
        expr = pq.filters_to_expression(filters) if filters else None
        if not m.has_deltas():
            kw = {"filter": expr} if expr is not None else {}
            if columns is None:
                # partitioning=None: the p=NNNNN dir layout must not be
                # hive-inferred into a phantom `p` column (it leaked into
                # downstream schemas, e.g. a replica bootstrapped from
                # this Dataset). Only safe WITHOUT columns= — Ray 2.49's
                # parquet datasource raises UnboundLocalError on
                # partitioning=None + columns; an explicit projection
                # already excludes the phantom column anyway.
                kw["partitioning"] = None
            return rd.read_parquet(
                m.data_files(self.lake_dir), columns=columns, **kw
            )
        # merge-on-read: one task per partition overlays its delta parts
        # (same LWW kernel as apply/compact); column pruning applies
        # post-merge — doc_id/lsn/op always travel for the merge itself
        lake_dir = self.lake_dir
        schema_b64 = m.schema.serialize().to_pybytes()
        items = [
            {"k": k, "file": e["file"], "deltas": list(e.get("deltas", []))}
            for k, e in sorted(m.partitions.items())
        ]

        def merge_items(batch: pa.Table) -> pa.Table:
            schema = pa.ipc.read_schema(pa.BufferReader(schema_b64))
            outs = []
            for row in batch.to_pylist():
                base = pq.read_table(
                    os.path.join(lake_dir, row["file"]), filters=filters
                )
                deltas = [
                    pq.read_table(os.path.join(lake_dir, d)) for d in row["deltas"]
                ]
                t = _merge_partition(base, deltas, schema)
                if expr is not None:
                    t = t.filter(expr)
                outs.append(t.select(columns) if columns else t)
            if not outs:
                empty = schema.empty_table()
                return empty.select(columns) if columns else empty
            return pa.concat_tables(outs)

        return rd.from_items(items, override_num_blocks=len(items)).map_batches(
            merge_items, batch_format="pyarrow"
        )

    def quarantine(self) -> pa.Table:
        """All quarantined (malformed, never-applied) event rows — the
        inspectable NiFi 'failure' relationship. Small by construction
        (bad records, not data); driver-side read is fine."""
        qdir = os.path.join(self.lake_dir, "_quarantine")
        files = (
            [
                os.path.join(qdir, f)
                for f in sorted(os.listdir(qdir))
                if f.endswith(".parquet")
            ]
            if os.path.isdir(qdir)
            else []
        )
        if not files:
            return pa.table({})
        return pa.concat_tables(
            [pq.read_table(f) for f in files], promote_options="permissive"
        )

    def export_shards(
        self,
        out_dir: str,
        max_len: int = 2048,
        version: int | None = None,
    ) -> list[dict]:
        """Export the lake's committed state as packed training shards:
        one parquet per lake partition under ``out_dir/shard=<k>/``,
        each row a fixed-length training sequence (concat-and-chunk of
        the partition's docs in doc_id order — stages/packing.pack_group,
        columns shard/seq_idx/tokens/n_tok/tok_sum).

        Shape: one Ray task per partition, ZERO shuffle — the lake's
        hash partitioning is reused as the shard key, so export
        parallelism equals partition count and each task touches one
        partition's files. Merge-on-read deltas are overlaid with the
        same LWW kernel as read(). Resumable AND incrementally
        refreshable: each shard file records the manifest entry (base
        file + delta chain) it was packed from in its parquet footer;
        a re-export skips shards whose entry is unchanged and rewrites
        exactly the partitions later ticks touched (O(delta-partitions)
        work, atomic supersede) — existence alone is NOT trusted, so a
        stale shard from an earlier lake version can never survive a
        refresh. Per-shard layout is a pure function of (partition
        contents, max_len) — retries produce identical bytes. Shard
        dirs for partitions that no longer exist (rescale shrink) are
        removed. Returns per-shard stats rows (``written`` marks the
        shards this call actually packed)."""
        import ray.data as rd

        from ..stages.packing import pack_group

        m = self.manifest(version)
        if m is None or not m.partitions:
            raise FileNotFoundError(f"no committed manifest in {self.lake_dir}")
        lake_dir = self.lake_dir
        schema_b64 = m.schema.serialize().to_pybytes()
        items = [
            {"k": k, "file": e["file"], "deltas": list(e.get("deltas", []))}
            for k, e in sorted(m.partitions.items())
        ]
        os.makedirs(out_dir, exist_ok=True)
        pack = pack_group(max_len, order_key="doc_id", keep=())

        _EH_KEY = b"nifi_ray.export.entry_hash"

        def export_item(batch: pa.Table) -> pa.Table:
            schema = pa.ipc.read_schema(pa.BufferReader(schema_b64))
            rows = []
            for row in batch.to_pylist():
                k = int(row["k"])
                rel = os.path.join(f"shard={k:05d}", f"pack-{max_len}.parquet")
                outp = os.path.join(out_dir, rel)
                # content key: manifest entries reference IMMUTABLE
                # files, so (base file, delta chain, max_len) fully
                # identifies this shard's bytes
                eh = hashlib.md5(
                    json.dumps([row["file"], row["deltas"], max_len]).encode()
                ).hexdigest()
                fresh = False
                if os.path.exists(outp):
                    md = pq.read_metadata(outp).metadata or {}
                    fresh = md.get(_EH_KEY, b"").decode() == eh
                if not fresh:
                    base = pq.read_table(os.path.join(lake_dir, row["file"]))
                    deltas = [
                        pq.read_table(os.path.join(lake_dir, d))
                        for d in row["deltas"]
                    ]
                    packed = pack(_merge_partition(base, deltas, schema))
                    packed = packed.add_column(
                        0, "shard", pa.array([k] * packed.num_rows, pa.int32())
                    )
                    packed = packed.replace_schema_metadata(
                        {_EH_KEY.decode(): eh}
                    )
                    os.makedirs(os.path.dirname(outp), exist_ok=True)
                    tmp = outp + f".tmp.{os.getpid()}"
                    pq.write_table(packed, tmp, compression="zstd")
                    os.replace(tmp, outp)
                rows.append(
                    {
                        "shard": k,
                        "file": rel,
                        "n_seqs": pq.read_metadata(outp).num_rows,
                        "written": not fresh,
                    }
                )
            return pa.Table.from_pylist(
                rows,
                schema=pa.schema(
                    [
                        pa.field("shard", pa.int32()),
                        pa.field("file", pa.string()),
                        pa.field("n_seqs", pa.int64()),
                        pa.field("written", pa.bool_()),
                    ]
                ),
            )

        stats = (
            rd.from_items(items, override_num_blocks=len(items))
            .map_batches(export_item, batch_format="pyarrow")
            .take_all()
        )
        # rescale shrink leaves shard dirs for partitions that no
        # longer exist — a reader globbing out_dir would double-count
        live = {f"shard={int(r['k']):05d}" for r in items}
        for d in os.listdir(out_dir):
            if d.startswith("shard=") and d not in live:
                import shutil

                shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)
        return stats

    def lookup(
        self,
        doc_ids: list[str],
        columns: list[str] | None = None,
        version: int | None = None,
    ) -> pa.Table:
        """Point reads (the GetHBase/FetchHBaseRow random-read shape):
        fetch exactly these doc_ids from the committed state.

        Scale path: the requested ids hash to their partitions
        (util/hashing.partition_of — the SAME function the write
        exchange uses), so only touched partitions spawn a task, and
        each task pushes ``doc_id IN (...)`` into the parquet read
        (row-group stat pruning + dictionary filtering), merging the
        partition's deltas LWW over just the surviving rows. A k-id
        lookup on a P-partition lake costs ≤ min(k, P) tasks and
        row-group-sized I/O, never a lake scan."""
        import ray as _ray

        from ..util.hashing import partition_of

        m = self.manifest(version)
        if m is None or not m.partitions:
            raise FileNotFoundError(f"no committed manifest in {self.lake_dir}")
        ids = sorted(set(doc_ids))
        if not ids:
            return m.schema.empty_table().select(columns) if columns else m.schema.empty_table()
        pids = partition_of(pa.array(ids, pa.string()), m.num_partitions)
        by_part: dict[int, list[str]] = {}
        for i, p in zip(ids, pids):
            by_part.setdefault(int(p), []).append(i)

        lake_dir = self.lake_dir
        schema_b64 = m.schema.serialize().to_pybytes()

        @_ray.remote(num_cpus=1)
        def _lookup_task(file, deltas, want, want_cols):
            _limit_arrow_threads()
            schema = pa.ipc.read_schema(pa.BufferReader(schema_b64))
            flt = [("doc_id", "in", want)]
            base = pq.read_table(os.path.join(lake_dir, file), filters=flt)
            ds_ = [
                pq.read_table(os.path.join(lake_dir, d), filters=flt)
                for d in deltas
            ]
            t = _merge_partition(base, ds_, schema)
            return t.select(want_cols) if want_cols else t

        refs = []
        for p, want in sorted(by_part.items()):
            e = m.partitions.get(str(p)) or m.partitions.get(p)
            if e is None:
                continue
            refs.append(
                _lookup_task.remote(e["file"], list(e.get("deltas", [])), want, columns)
            )
        parts = _ray.get(refs)
        if not parts:
            return m.schema.empty_table()
        return pa.concat_tables(parts).sort_by("doc_id")

    def doc_history(self, doc_id: str) -> pa.Table:
        """Provenance drill-down for ONE doc: its committed change
        events (I/U/D + image) across every retained lake version —
        the per-record answer NiFi's provenance repository serves
        (reference PersistentProvenanceRepository, nifi-in-depth.adoc:94:
        every FlowFile's lineage queryable after the fact; here lineage
        IS the manifest chain).

        Cost: one partition-pruned point read per retained version
        (``lookup``'s pushdown — ids hash to their partition, ``doc_id
        IN`` filters row groups), never a lake scan; the scan unit is
        the retention window, exactly like the reference's provenance
        index. Columns: version, watermark, change_op, then the row
        image (the pre-delete image for 'D', Delta-CDF style)."""
        from ..stages.evolve import conform as _conform
        from ..state.manifest import retained_versions
        from ..util.hashing import row_image_hash

        versions = retained_versions(self.lake_dir)
        if not versions:
            raise FileNotFoundError(f"no committed manifest in {self.lake_dir}")
        events: list[tuple[int, int, str, pa.Table]] = []
        prev: pa.Table | None = None  # 1-row image or None
        schema = None
        for v in versions:
            m = self.manifest(v)
            schema = m.schema
            t = self.lookup([doc_id], version=v)
            cur = t if t.num_rows else None
            if prev is None and cur is not None:
                events.append((v, m.applied_through, "I", cur))
            elif prev is not None and cur is None:
                events.append((v, m.applied_through, "D", prev))
            elif prev is not None and cur is not None:
                # schema may have evolved between retained versions:
                # conform BOTH images to this version's (unified-latest)
                # schema — prev gains null-filled added columns, so an
                # added column with a value in cur reads as 'U', while
                # selecting cur's names out of prev would KeyError
                payload = [n for n in m.schema.names if n != "doc_id"]
                if list(row_image_hash(_conform(cur, m.schema), payload)) != list(
                    row_image_hash(_conform(prev, m.schema), payload)
                ):
                    events.append((v, m.applied_through, "U", cur))
            prev = cur
        if not events:
            empty = schema.empty_table()
            for i, (name, t) in enumerate(
                (("version", pa.int64()), ("watermark", pa.int64()), ("change_op", pa.string()))
            ):
                empty = empty.add_column(i, name, pa.array([], t))
            return empty
        from ..stages.evolve import conform

        # conform every image to the LATEST manifest schema (not the last
        # event's image schema — a trailing 'D' stores a pre-delete image
        # that may predate later column adds)
        rows = pa.concat_tables(
            [conform(img, schema) for _, _, _, img in events]
        )
        out = rows
        out = out.add_column(0, "change_op", pa.array([e[2] for e in events], pa.string()))
        out = out.add_column(0, "watermark", pa.array([e[1] for e in events], pa.int64()))
        out = out.add_column(0, "version", pa.array([e[0] for e in events], pa.int64()))
        return out

    def read_table(self) -> pa.Table:
        """Driver-side full materialization — TESTS ONLY (small lakes)."""
        m = self.manifest()
        if m is None:
            raise FileNotFoundError(f"no committed manifest in {self.lake_dir}")
        tables = []
        for k, e in sorted(m.partitions.items()):
            base = pq.read_table(os.path.join(self.lake_dir, e["file"]))
            deltas = [
                pq.read_table(os.path.join(self.lake_dir, d))
                for d in e.get("deltas", [])
            ]
            tables.append(_merge_partition(base, deltas, m.schema))
        if not tables:
            return m.schema.empty_table()
        return pa.concat_tables(tables).sort_by("doc_id")

    def changes(
        self,
        since_version: int,
        version: int | None = None,
        columns: list[str] | None = None,
    ) -> "ray.data.Dataset":
        """Change feed: Dataset of per-doc net changes between two
        retained committed versions (snapshot diff, Delta-Lake-CDF
        analog; NiFi analog: QueryDatabaseTable's watermark-bounded
        incremental fetch pointed at our own lake).

        One row per doc whose committed image changed from
        ``since_version`` to ``version`` (default latest):
        ``change_op`` 'I' new doc (new image) / 'U' image changed (new
        image) / 'D' doc removed (old image). No-op writes are excluded
        — consumers see exactly the docs they must re-process, which is
        the point of a change feed at 100 TB: downstream reads O(changed
        docs), never O(lake).

        Scale shape: partitions whose manifest entry (base file + delta
        list) is identical in both versions are pruned WITHOUT any file
        I/O — a tick that touched 10 of 4096 partitions yields 10 diff
        tasks. Across a rescale (P changed) entries aren't comparable;
        each new-partition task then reads the P_old/gcd(P_old,P_new)
        old partitions that can hold its docs (hash partitioning is
        stable, so doc→partition is congruence-structured) and filters
        to its own key range — worst case (coprime P) degrades to a
        full cross-read, so rescale by multiples.
        """
        import ray.data as rd

        m_old = self.manifest(since_version)
        m_new = self.manifest(version)
        if m_old is None or m_new is None:
            raise FileNotFoundError(
                f"changes({since_version}, {version}): version not retained "
                f"in {self.lake_dir} (expired or never committed)"
            )
        items, same_p = _version_diff_plan(m_old, m_new)
        p_new = m_new.num_partitions

        schema = m_new.schema
        out_schema = schema.empty_table().add_column(
            0, "change_op", pa.array([], pa.string())
        ).schema
        if not items:
            empty = out_schema.empty_table()
            return rd.from_arrow(empty.select(columns) if columns else empty)

        lake_dir = self.lake_dir
        schema_b64 = schema.serialize().to_pybytes()

        def diff_items(batch: pa.Table) -> pa.Table:
            tgt = pa.ipc.read_schema(pa.BufferReader(schema_b64))

            def snap(file: str | None, deltas: list[str]) -> pa.Table:
                base = (
                    pq.read_table(os.path.join(lake_dir, file))
                    if file
                    else tgt.empty_table()
                )
                parts = [pq.read_table(os.path.join(lake_dir, d)) for d in deltas]
                return _merge_partition(base, parts, tgt)

            outs = []
            for row in batch.to_pylist():
                k = int(row["k"])
                if row.get("suffix_deltas") is not None:
                    # delta-append fast path: read only the appended
                    # delta files + point reads of those docs' old
                    # images (O(delta) bytes, never two full
                    # snapshots); _diff_snapshots still drops no-op
                    # writes by image comparison
                    old_t, new_t = _suffix_changed_images(lake_dir, row, tgt)
                else:
                    new_t = snap(row["new_file"], row["new_deltas"])
                    olds = [
                        snap(f, d) for f, d in zip(row["old_files"], row["old_deltas"])
                    ]
                    old_t = (
                        pa.concat_tables(olds, promote_options="permissive")
                        if olds
                        else tgt.empty_table()
                    )
                    if not same_p and old_t.num_rows:
                        # keep only docs this NEW partition owns (an old
                        # partition feeds p_new/g new partitions)
                        old_t = old_t.filter(
                            pa.array(partition_of(old_t["doc_id"], p_new) == k)
                        )
                outs.append(_diff_snapshots(old_t, new_t))
            out = (
                pa.concat_tables(outs)
                if outs
                else out_schema.empty_table()
            )
            return out.select(columns) if columns else out

        return rd.from_items(items, override_num_blocks=len(items)).map_batches(
            diff_items, batch_format="pyarrow"
        )

    # ------------------------------------------- materialized aggregates
    def create_aggregate(
        self,
        name: str,
        group_by: list[str],
        sums: list[str],
        derive: list[list[str]] | None = None,
    ) -> pa.Table:
        """Create an incrementally-maintained GROUP BY view (matview.py):
        one full scan now, O(delta) refreshes forever after."""
        from .matview import create_aggregate

        return create_aggregate(self, name, group_by, sums, derive)

    def refresh_aggregate(self, name: str) -> pa.Table:
        """Advance a maintained view to the latest lake version reading
        only partitions the manifest says changed (matview.py)."""
        from .matview import refresh_aggregate

        return refresh_aggregate(self, name)

    def read_aggregate(self, name: str, version: int | None = None) -> pa.Table:
        """A maintained view's published snapshot (matview.py)."""
        from .matview import read_aggregate

        return read_aggregate(self, name, version)

    # ------------------------------------------------ near-dup index
    def create_dedup_index(self, name: str = "neardup", **kw) -> dict:
        """Build an incrementally-maintained MinHash/LSH band index over
        the lake's tokens (pipelines/dedup_index.py)."""
        from .dedup_index import create_dedup_index

        return create_dedup_index(self, name, **kw)

    def refresh_dedup_index(self, name: str = "neardup", **kw) -> dict:
        """Advance the near-dup index to the latest lake version reading
        only manifest-changed partitions (pipelines/dedup_index.py)."""
        from .dedup_index import refresh_dedup_index

        return refresh_dedup_index(self, name, **kw)

    def create_ann_index(self, name: str = "ann", **kw) -> dict:
        """Create an incrementally-maintained IVF ANN index over the
        lake's token embeddings (pipelines/ann_index.py)."""
        from .ann_index import create_ann_index

        return create_ann_index(self, name, **kw)

    def refresh_ann_index(self, name: str = "ann", **kw) -> dict:
        """Advance the ANN index to the latest lake version — O(changed
        docs) cell patches, dense ticks rebuild (pipelines/ann_index.py)."""
        from .ann_index import refresh_ann_index

        return refresh_ann_index(self, name, **kw)

    def ann_search(self, query_doc_ids: list[str], name: str = "ann", **kw):
        """Top-k cosine neighbors of these docs' current images against
        the maintained index — point-read queries, nprobe cell reads,
        never a scan (pipelines/ann_index.py)."""
        from .ann_index import ann_search

        return ann_search(self, name, query_doc_ids, **kw)

    def near_dup_candidates(
        self, since_version: int, name: str = "neardup", **kw
    ) -> pa.Table:
        """Near-dup pairs for docs changed since a version vs the whole
        indexed corpus (pipelines/dedup_index.py)."""
        from .dedup_index import candidate_pairs_for

        return candidate_pairs_for(self, name, since_version, **kw)

    # ----------------------------------------------------------- apply
    def replay(
        self,
        event_paths: str | list[str],
        lsn_hi: int | None = None,
        batch_size: int = 65536,
        exchange: str = "direct",
        mode: str = "cow",
        from_lsn: int | None = None,
        max_conflict_retries: int = 3,
    ) -> TickStats | None:
        """Apply all events with ``applied_through < lsn <= lsn_hi``;
        optimistic concurrency against other writers on the same lake.

        A concurrent writer racing the same manifest version surfaces
        as ``CommitConflict`` — either at a data-part publish (exclusive
        link sees foreign bytes at a deterministic part path, phase 1)
        or at the manifest link (phase 2). Both mean the OTHER tick
        committed; this one re-reads the now-advanced manifest and
        re-runs, and the watermark dedup drops whatever the winner
        already applied (exactly-once preserved — possibly a no-op
        retry). Orphan parts from the losing attempt are invisible and
        reclaimed by ``gc_orphans``. After ``max_conflict_retries``
        losses the conflict propagates."""
        def is_conflict(e: BaseException | None) -> bool:
            # Ray (and Ray Data) may wrap worker exceptions; walk the
            # cause chain for the publish_part conflicts raised inside
            # apply tasks
            while e is not None:
                if isinstance(e, CommitConflict):
                    return True
                e = e.__cause__
            return False

        last: Exception | None = None
        for _ in range(max_conflict_retries + 1):
            try:
                return self._replay_once(
                    event_paths, lsn_hi, batch_size, exchange, mode, from_lsn
                )
            except Exception as e:
                if not is_conflict(e):
                    raise
                last = e
        raise last

    def _replay_once(
        self,
        event_paths: str | list[str],
        lsn_hi: int | None = None,
        batch_size: int = 65536,
        exchange: str = "direct",
        mode: str = "cow",
        from_lsn: int | None = None,
    ) -> TickStats | None:
        """Apply all events with ``applied_through < lsn <= lsn_hi``.

        One tick = one manifest version. Returns None if there was
        nothing to apply (watermark already covers the range).

        ``from_lsn``: override the dedup low bound (default: the
        manifest watermark). Sources that track their own delivery
        cursor — e.g. the segment consumer's per-partition offsets,
        which a single scalar watermark cannot represent — pass 0 so
        every spooled event applies; re-application of identical images
        in the crash window is LWW-idempotent on state.

        mode="cow" (default): each touched partition's file is fully
        rewritten (reads see one file per partition; per-tick write cost
        is O(partition)). mode="delta": the tick writes only the
        collapsed events as a delta part per touched partition —
        O(delta) bytes per tick, the scale answer to one-hot-doc-per-
        partition write amplification; readers overlay deltas by LWW
        (merge-on-read) and ``compact()`` folds them back into base
        parts. Final state is identical in both modes (same LWW kernel).

        exchange="direct" (default): explicit two-stage map/apply
        exchange with raw Ray tasks — map tasks read+premerge their
        files and return one shard object PER PARTITION
        (``num_returns=P``); apply tasks consume exactly their
        partition's shards. One object-store write and one read per
        byte. This is the pattern ray_guide prescribes for explicit
        partitioned joins; measured 2.5-3x faster than the Dataset
        hash-shuffle (which adds an aggregator-actor hop = an extra
        full copy of the stream + per-execution actor spawn).
        Partitioning assumption: P small enough that P objects per map
        task is reasonable (≤ ~1024); for larger P, group partitions
        per shard.

        exchange="dataset": the pure Dataset pipeline
        (map_batches → keyed hash repartition → map_batches).
        """
        import time as _time

        from ..sources.binlog import list_event_files, prune_event_files

        t0 = _time.perf_counter()
        m = self.manifest()
        if m is None:
            raise FileNotFoundError("lake not initialized (no manifest)")
        lo = m.applied_through if from_lsn is None else from_lsn

        # binlog-tail: footer-stat prune → whole already-applied files
        # are never opened (sources/binlog.py)
        files = list_event_files(event_paths)
        files, prune_stats = prune_event_files(files, lo, lsn_hi)
        if not files:
            return None

        # Schema evolution check happens BEFORE the shuffle: unify the
        # lake schema with every kept file's FOOTER schema (metadata
        # only — handles mid-stream evolution), bump on change.
        ev_fields = [
            pa.schema(
                [f for f in pq.read_schema(f_) if f.name not in ("lsn", "op")]
            )
            for f_ in files
        ]
        target = m.schema
        for s in ev_fields:
            target = unify(target, s)
        schema_version = m.schema_version + (0 if target.equals(m.schema) else 1)

        base_files = {
            k: {"file": e["file"], "deltas": list(e.get("deltas", []))}
            for k, e in m.partitions.items()
        }
        next_version = m.version + 1
        qdir = os.path.join(self.lake_dir, "_quarantine")
        q_before = _quarantine_row_count(qdir)

        # tick token: deterministic in the tick's INPUTS — an identical
        # retry (Ray task retry, crash re-run of the same tick)
        # regenerates the same part names and bytes (publish_part
        # dedups), while any different attempt at this version (resumed
        # tick with other bounds, concurrent writer with other events)
        # writes under fresh names and can never clobber files another
        # writer's manifest might reference
        tick_token = hashlib.md5(
            json.dumps([m.version, lo, lsn_hi, mode, sorted(files)]).encode()
        ).hexdigest()[:8]
        if mode == "delta":
            stats_rows = self._exchange_direct(
                files, m, target, next_version, lo, lsn_hi, delta=True,
                tick_token=tick_token,
            )
        elif exchange == "direct":
            stats_rows = self._exchange_direct(
                files, m, target, next_version, lo, lsn_hi,
                tick_token=tick_token,
            )
        else:
            stats_rows = self._exchange_dataset(
                files, m, target, next_version, lo, lsn_hi, batch_size,
                tick_token=tick_token,
            )

        if not stats_rows:
            return None

        max_lsn_seen = max(int(r["max_lsn"]) for r in stats_rows)
        hi = lsn_hi if lsn_hi is not None else max_lsn_seen
        # a from_lsn override may apply events below the committed
        # watermark — the watermark itself never regresses
        hi = max(hi, m.applied_through)

        partitions = dict(m.partitions)
        for r in stats_rows:
            k = int(r["partition_id"])
            if mode == "delta":
                e = dict(partitions[k])
                e["deltas"] = list(e.get("deltas", [])) + [r["delta_file"]]
                # per-delta-file integrity record so verify() can cover
                # merge-on-read lakes without compacting first
                dm = dict(e.get("delta_meta", {}))
                dm[r["delta_file"]] = {
                    "rows": int(r["delta_rows"]),
                    "hash": int(r["delta_hash"]),
                    "hash_rev": HASH_REV,
                }
                e["delta_meta"] = dm
                e["max_lsn"] = int(r["max_lsn"])
                partitions[k] = e
            else:
                partitions[k] = {
                    "file": r["file"],
                    "rows": int(r["rows"]),
                    "max_lsn": int(r["max_lsn"]),
                    "token_hash": int(r["token_hash"]),
                    "hash_rev": HASH_REV,
                }
        events_applied = sum(int(r["events_applied"]) for r in stats_rows)
        dups = sum(int(r["dups_dropped"]) for r in stats_rows)
        quarantined = _quarantine_row_count(qdir) - q_before
        wall = _time.perf_counter() - t0
        lineage = {
            "kind": "APPLY" if mode == "cow" else "APPLY_DELTA",
            "lsn_range": [lo, hi],
            "events_applied": events_applied,
            "dups_dropped": dups,
            "files_in": prune_stats.kept,
            "files_skipped_by_footer": prune_stats.skipped_by_footer,
            "partitions_touched": len(stats_rows),
            "quarantined": quarantined,
            "deletes": sum(int(r["deletes"]) for r in stats_rows),
            "bytes_written": sum(int(r["bytes_written"]) for r in stats_rows),
            "wall_sec": round(wall, 3),
            "files_out": [r.get("file") or r.get("delta_file") for r in stats_rows],
        }
        m2 = Manifest(
            version=next_version,
            num_partitions=m.num_partitions,
            schema_version=schema_version,
            schema=target,
            applied_through=hi,
            partitions=partitions,
            lineage=append_lineage(m.lineage, lineage),
        )
        commit_manifest(self.lake_dir, m2)
        from ..state.metrics import append_tick_metrics

        append_tick_metrics(self.lake_dir, next_version, (lo, hi), wall, stats_rows)
        return TickStats(
            version=next_version,
            lo=lo,
            hi=hi,
            partitions_touched=len(stats_rows),
            events_applied=events_applied,
            dups_dropped=dups,
            rows_total=sum(p["rows"] for p in partitions.values()),
            wall_sec=wall,
            quarantined=quarantined,
        )

    def rescale(self, new_num_partitions: int) -> Manifest:
        """Repartition the lake to a new partition count (one manifest
        version; the watermark is unchanged). The growth operation at
        scale: double P when partitions outgrow a task's memory. Uses
        the same keyed exchange as init."""
        m = self.manifest()
        if m is None:
            raise FileNotFoundError("lake not initialized")
        if m.has_deltas():
            # rescale reads base part files only — fold deltas first so
            # merge-on-read state is never silently dropped
            self.compact()
            m = self.manifest()
        next_version = m.version + 1
        lake_dir = self.lake_dir
        schema_b64 = m.schema.serialize().to_pybytes()
        files = m.data_files(lake_dir)

        P = new_num_partitions
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        n_maps = max(1, min(len(files), ncpu))
        chunks = [files[i::n_maps] for i in range(n_maps)]

        map_refs = [
            _rescale_map_task.options(num_returns=P).remote(chunk, P)
            for chunk in chunks
        ]
        if P == 1:
            map_refs = [[r] for r in map_refs]
        tick_token = hashlib.md5(
            json.dumps([m.version, "rescale", P]).encode()
        ).hexdigest()[:8]
        apply_refs = [
            _rescale_write_task.remote(
                lake_dir, schema_b64, next_version, k, tick_token,
                *[refs[k] for refs in map_refs],
            )
            for k in range(P)
        ]
        partitions = {}
        for row in ray.get(apply_refs):
            if row:
                partitions[row["partition_id"]] = {
                    "file": row["file"],
                    "rows": row["rows"],
                    "max_lsn": m.applied_through,
                    "token_hash": row["token_hash"],
                    "hash_rev": HASH_REV,
                }
        m2 = Manifest(
            version=next_version,
            num_partitions=P,
            schema_version=m.schema_version,
            schema=m.schema,
            applied_through=m.applied_through,
            partitions=partitions,
            lineage=append_lineage(
                m.lineage,
                {
                    "kind": "RESCALE",
                    "from_partitions": m.num_partitions,
                    "to_partitions": P,
                    "rows": sum(p["rows"] for p in partitions.values()),
                },
            ),
        )
        commit_manifest(self.lake_dir, m2)
        return m2

    def restore(self, version: int) -> Manifest:
        """Roll the lake back to an earlier RETAINED version as a NEW
        commit (the Delta Lake RESTORE shape): the new manifest copies
        the target's partitions / schema / watermark under
        ``latest + 1``, so history stays linear and a later
        ``replay`` resumes from the restored watermark (re-ingesting
        the rolled-back LSN range idempotently). Zero data movement —
        part files are shared by reference; ``gc_orphans`` keeps them
        live because the restored manifest references them. Lineage
        gains a RESTORE record on top of the CURRENT history (roll
        forward, not erase)."""
        cur = self.manifest()
        if cur is None:
            raise FileNotFoundError("lake not initialized")
        tgt = self.manifest(version)
        if tgt is None:
            raise FileNotFoundError(f"version {version} is not retained")
        m2 = Manifest(
            version=cur.version + 1,
            num_partitions=tgt.num_partitions,
            schema_version=tgt.schema_version,
            schema=tgt.schema,
            applied_through=tgt.applied_through,
            partitions=tgt.partitions,
            lineage=append_lineage(
                cur.lineage,
                {
                    "kind": "RESTORE",
                    "to_version": version,
                    "applied_through": tgt.applied_through,
                },
            ),
        )
        commit_manifest(self.lake_dir, m2)
        return m2

    # ------------------------------------------------------- exchanges
    def _exchange_dataset(
        self, files, m: Manifest, target: pa.Schema, next_version: int,
        lo: int, lsn_hi: int | None, batch_size: int,
        tick_token: str | None = None,
    ) -> list[dict]:
        import ray.data as rd

        pred = pc.field("lsn") > pa.scalar(lo, pa.int64())
        if lsn_hi is not None:
            pred = pred & (pc.field("lsn") <= pa.scalar(lsn_hi, pa.int64()))
        ds = rd.read_parquet(files, filter=pred)
        base_files = {
            k: {"file": e["file"], "deltas": list(e.get("deltas", []))}
            for k, e in m.partitions.items()
        }
        return (
            _use_hash_shuffle(ds)
            .map_batches(
                _premerge_fn(m.num_partitions, lo, os.path.join(self.lake_dir, "_quarantine")),
                batch_format="pyarrow",
                batch_size=batch_size,
            )
            .repartition(m.num_partitions, keys=["partition_id"])
            .map_batches(
                _apply_partition_fn(
                    self.lake_dir,
                    base_files,
                    target.serialize().to_pybytes(),
                    next_version,
                    lo,
                    tick_token,
                ),
                batch_format="pyarrow",
                batch_size=None,
            )
            .take_all()
        )

    def _exchange_direct(
        self, files, m: Manifest, target: pa.Schema, next_version: int,
        lo: int, lsn_hi: int | None, delta: bool = False,
        tick_token: str | None = None,
    ) -> list[dict]:
        """Explicit map/apply exchange (see ``replay`` docstring).
        ``delta=True`` swaps the apply side for the delta writer."""
        P = m.num_partitions
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        n_maps = max(1, min(len(files), ncpu))
        chunks = [files[i::n_maps] for i in range(n_maps)]
        base_files = {
            k: {"file": e["file"], "deltas": list(e.get("deltas", []))}
            for k, e in m.partitions.items()
        }
        schema_b64 = target.serialize().to_pybytes()

        # grouped shards: at huge P a map task cannot reasonably return
        # P objects, so partitions are bundled into ≤ max_shards groups
        # (one apply task per group; it splits pids locally — same
        # within-task path as the Dataset exchange's apply_block)
        G = min(P, int(os.environ.get("NIFI_RAY_MAX_SHARDS", "512")))
        qdir = os.path.join(self.lake_dir, "_quarantine")
        map_refs = [
            _cdc_map_task.options(num_returns=G).remote(chunk, P, lo, lsn_hi, G, qdir)
            for chunk in chunks
        ]
        if G == 1:  # num_returns=1 returns a bare ref, normalize
            map_refs = [[r] for r in map_refs]
        if delta:
            apply_refs = [
                _cdc_delta_task.remote(
                    self.lake_dir, schema_b64, next_version, lo, tick_token,
                    *[refs[g] for refs in map_refs],
                )
                for g in range(G)
            ]
        else:
            apply_refs = [
                _cdc_apply_task.remote(
                    self.lake_dir,
                    base_files,
                    schema_b64,
                    next_version,
                    lo,
                    tick_token,
                    *[refs[g] for refs in map_refs],
                )
                for g in range(G)
            ]
        stats: list[dict] = []
        for rows in ray.get(apply_refs):
            if rows:
                stats.extend(rows)
        return stats

    # ----------------------------------------------------- verification
    def verify(self, version: int | None = None) -> dict:
        """Recompute every partition's content checksum and row count
        from its data files and compare to the committed manifest — the
        executable form of NiFi's site-to-site CRC32 transaction
        confirmation (reference nifi-commons/nifi-site-to-site-client/
        .../remote/AbstractTransaction.java:177-210: sender and receiver
        agree on a running checksum before COMPLETE). One Ray task per
        partition; returns {ok, partitions_checked, mismatches}.

        Merge-on-read partitions are covered too: the base file checks
        against the entry's (compacted-state) hash and every delta file
        against the per-file ``delta_meta`` record written at apply
        time, so a MOR lake needs no compaction for full verification.
        Delta files predating ``delta_meta`` (legacy manifests) are the
        only skip, reported in ``skipped_deltas``.

        Hash-algorithm versioning: every entry carries the
        ``hash_rev`` of the ``state_checksum`` that produced it
        (missing = rev 1, the pre-r4 clip-reduceat kernel). A file
        recorded under a DIFFERENT rev than this process computes is
        row-count-checked only — never reported as corruption — and
        counted in ``skipped_hash_rev``. Rewriting (apply / compact /
        rescale) re-stamps entries at the current rev, so a lake
        upgrades organically."""
        m = self.manifest(version)
        if m is None:
            raise FileNotFoundError("lake not initialized")
        lake_dir = self.lake_dir

        @ray.remote
        def check(k: int, rel: str) -> dict:
            _limit_arrow_threads()
            t = pq.read_table(os.path.join(lake_dir, rel))
            return {
                "partition_id": k,
                "file": rel,
                "rows": t.num_rows,
                "token_hash": state_checksum(t),
            }

        refs, want = [], {}
        skipped = 0
        for k, e in m.partitions.items():
            meta = e.get("delta_meta", {})
            deltas = e.get("deltas", [])
            if any(d not in meta for d in deltas):
                skipped += 1  # legacy manifest without per-delta records
                continue
            refs.append(check.remote(k, e["file"]))
            want[(k, e["file"])] = {
                "rows": e["rows"],
                "hash": int(e["token_hash"]),
                "rev": int(e.get("hash_rev", 1)),
            }
            for d in deltas:
                refs.append(check.remote(k, d))
                want[(k, d)] = {
                    "rows": meta[d]["rows"],
                    "hash": int(meta[d]["hash"]),
                    "rev": int(meta[d].get("hash_rev", 1)),
                }
        mismatches = []
        checked_parts = set()
        skipped_hash_rev = 0
        for r in ray.get(refs):
            exp = want[(r["partition_id"], r["file"])]
            checked_parts.add(r["partition_id"])
            hash_comparable = exp["rev"] == HASH_REV
            if not hash_comparable:
                skipped_hash_rev += 1
            if r["rows"] != exp["rows"] or (
                hash_comparable and int(r["token_hash"]) != exp["hash"]
            ):
                mismatches.append(
                    {
                        "partition_id": r["partition_id"],
                        "file": r["file"],
                        "rows": [exp["rows"], r["rows"]],
                        "token_hash": [exp["hash"], int(r["token_hash"])],
                    }
                )
        return {
            "ok": not mismatches,
            "partitions_checked": len(checked_parts),
            "files_checked": len(want),
            "skipped_deltas": skipped,
            "skipped_hash_rev": skipped_hash_rev,
            "mismatches": mismatches,
        }

    # ------------------------------------------------------- compaction
    def compact(self, min_deltas: int = 1) -> Manifest | None:
        """Fold delta parts back into COW base parts (one manifest
        version). Only partitions with ≥ ``min_deltas`` deltas are
        rewritten; a periodic compactor would call this with a higher
        threshold so per-tick cost stays O(delta) and read amplification
        stays bounded. Returns None if nothing to compact."""
        m = self.manifest()
        if m is None:
            raise FileNotFoundError("lake not initialized")
        todo = {
            k: e for k, e in m.partitions.items()
            if len(e.get("deltas", [])) >= max(min_deltas, 1)
        }
        if not todo:
            return None
        next_version = m.version + 1
        schema_b64 = m.schema.serialize().to_pybytes()
        tick_token = hashlib.md5(
            json.dumps([m.version, "compact"]).encode()
        ).hexdigest()[:8]
        refs = [
            _compact_task.remote(
                self.lake_dir, e.get("file"), list(e["deltas"]),
                schema_b64, next_version, k, tick_token,
            )
            for k, e in todo.items()
        ]
        partitions = dict(m.partitions)
        bytes_written = 0
        for r in ray.get(refs):
            k = int(r["partition_id"])
            partitions[k] = {
                "file": r["file"],
                "rows": int(r["rows"]),
                "max_lsn": int(m.partitions[k]["max_lsn"]),
                "token_hash": int(r["token_hash"]),
                "hash_rev": HASH_REV,
            }
            bytes_written += int(r["bytes_written"])
        m2 = Manifest(
            version=next_version,
            num_partitions=m.num_partitions,
            schema_version=m.schema_version,
            schema=m.schema,
            applied_through=m.applied_through,
            partitions=partitions,
            lineage=append_lineage(
                m.lineage,
                {
                    "kind": "COMPACT",
                    "partitions": sorted(todo),
                    "deltas_folded": sum(len(e["deltas"]) for e in todo.values()),
                    "bytes_written": bytes_written,
                },
            ),
        )
        commit_manifest(self.lake_dir, m2)
        return m2

    def replay_ticks(
        self, event_paths: str | list[str], tick_size: int, lsn_end: int,
        mode: str = "cow",
    ) -> list[TickStats]:
        """Batch-replay loop: chunks of LSN ranges as ticks, one commit
        each — the 'continuous' mode (SURVEY.md §7.3 step 8)."""
        out = []
        while True:
            m = self.manifest()
            lo = m.applied_through
            if lo >= lsn_end:
                break
            hi = min(lo + tick_size, lsn_end)
            st = self.replay(event_paths, lsn_hi=hi, mode=mode)
            if st is not None:
                out.append(st)
            elif hi >= lsn_end:
                break
            else:
                # empty range: advance watermark with a metadata-only commit
                m2 = load_manifest(self.lake_dir)
                m2.version += 1
                m2.applied_through = hi
                m2.lineage = append_lineage(
                    m2.lineage,
                    {"kind": "APPLY", "lsn_range": [lo, hi], "events_applied": 0},
                )
                commit_manifest(self.lake_dir, m2)
        return out
