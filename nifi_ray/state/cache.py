"""Shared K-V / set cache as a named detached Ray actor.

NiFi's DistributedMapCacheServer / DistributedSetCacheServer (reference
nifi-standard-services/nifi-distributed-cache-services-bundle/.../server/
DistributedMapCacheServer.java, EvictionPolicy.java) back DetectDuplicate,
FetchDistributedMapCache and cross-node waits. The keyed-partition CDC
path does NOT need this (state lives in the manifest, SURVEY.md §2.6);
this actor exists for the streaming cases a hash-partitioned groupby
can't express — e.g. cross-pipeline dedup against a live set.

Eviction policies mirror the reference: LFU / LRU / FIFO
(EvictionPolicy.java:22-60). ``get_and_put_if_absent`` is
DetectDuplicate's atomic primitive (DetectDuplicate.java:106).

At multi-node scale a SINGLE cache actor is a bottleneck by design
(just like NiFi's single cache server) — shard with
``CacheClient(shards=N)`` which routes keys by the same stable CRC hash
the lake partitioner uses.
"""

from __future__ import annotations

from typing import Any

import ray

from ..util.hashing import crc32_of_strings


@ray.remote
class MapCacheActor:
    def __init__(self, max_entries: int = 100_000, eviction: str = "LRU"):
        assert eviction in ("LRU", "LFU", "FIFO")
        self.max_entries = max_entries
        self.eviction = eviction
        self.data: dict[str, Any] = {}
        self.freq: dict[str, int] = {}
        self.tick = 0
        self.order: dict[str, int] = {}  # insert (FIFO) or touch (LRU) tick

    def _touch(self, key: str, inserted: bool):
        self.tick += 1
        self.freq[key] = self.freq.get(key, 0) + 1
        if self.eviction == "LRU" or (self.eviction == "FIFO" and inserted):
            self.order[key] = self.tick

    def _evict_if_needed(self):
        while len(self.data) > self.max_entries:
            if self.eviction == "LFU":
                victim = min(self.freq, key=lambda k: (self.freq[k], self.order.get(k, 0)))
            else:  # LRU and FIFO both evict the smallest order tick
                victim = min(self.order, key=self.order.get)
            self.data.pop(victim, None)
            self.freq.pop(victim, None)
            self.order.pop(victim, None)

    def put(self, key: str, value: Any):
        inserted = key not in self.data
        self.data[key] = value
        self._touch(key, inserted)
        self._evict_if_needed()

    def get(self, key: str) -> Any:
        if key in self.data:
            self._touch(key, inserted=False)
            return self.data[key]
        return None

    def get_and_put_if_absent(self, key: str, value: Any) -> Any:
        """Atomic: returns the existing value (duplicate detected) or
        None after inserting (first writer)."""
        if key in self.data:
            self._touch(key, inserted=False)
            return self.data[key]
        self.put(key, value)
        return None

    def put_if_absent_many(self, keys: list, value: Any = True) -> list:
        """Batched ``get_and_put_if_absent`` (one actor RPC per batch
        instead of per key — at 10^10 rows per-key round-trips are the
        bottleneck, not the hash probe). Returns per-key True when this
        call was the first writer. Atomic per shard: the actor is
        single-threaded, so two concurrent batches sharing a key see
        exactly one True between them."""
        out = []
        for k in keys:
            if k in self.data:
                self._touch(k, inserted=False)
                out.append(False)
            else:
                self.put(k, value)
                out.append(True)
        return out

    def contains(self, key: str) -> bool:
        return key in self.data

    def remove(self, key: str) -> bool:
        self.freq.pop(key, None)
        self.order.pop(key, None)
        return self.data.pop(key, None) is not None

    def size(self) -> int:
        return len(self.data)


class CacheClient:
    """Sharded client: routes each key to one of N cache actors by the
    stable CRC32 hash (same partitioner as the lake)."""

    def __init__(self, name: str = "nifi_ray_cache", shards: int = 1, max_entries: int = 100_000, eviction: str = "LRU"):
        self.shards = []
        for s in range(shards):
            actor_name = f"{name}_{s}"
            try:
                a = ray.get_actor(actor_name)
            except ValueError:
                a = MapCacheActor.options(
                    name=actor_name, lifetime="detached", get_if_exists=True
                ).remote(max_entries=max_entries, eviction=eviction)
            self.shards.append(a)

    def _shard(self, key: str):
        import pyarrow as pa

        h = int(crc32_of_strings(pa.array([key]))[0])
        return self.shards[h % len(self.shards)]

    def put(self, key: str, value: Any):
        return ray.get(self._shard(key).put.remote(key, value))

    def get(self, key: str) -> Any:
        return ray.get(self._shard(key).get.remote(key))

    def get_and_put_if_absent(self, key: str, value: Any) -> Any:
        return ray.get(self._shard(key).get_and_put_if_absent.remote(key, value))

    def put_if_absent_many(self, keys: list) -> list:
        """Batched first-writer probe: ONE RPC per (batch × shard),
        results reassembled in input order."""
        import numpy as np
        import pyarrow as pa

        if not keys:
            return []
        h = crc32_of_strings(pa.array(keys, pa.string())).astype(np.int64) % len(
            self.shards
        )
        refs, idxs = [], []
        for s in range(len(self.shards)):
            idx = np.nonzero(h == s)[0]
            if idx.size:
                refs.append(
                    self.shards[s].put_if_absent_many.remote([keys[i] for i in idx])
                )
                idxs.append(idx)
        out = np.zeros(len(keys), dtype=bool)
        for idx, res in zip(idxs, ray.get(refs)):
            out[idx] = res
        return out.tolist()

    def contains(self, key: str) -> bool:
        return ray.get(self._shard(key).contains.remote(key))

    def remove(self, key: str) -> bool:
        return ray.get(self._shard(key).remove.remote(key))

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def shutdown(self):
        for a in self.shards:
            ray.kill(a)


class CacheDetectDuplicate:
    """DetectDuplicate against the live distributed cache (reference
    STD/DetectDuplicate.java:106 — its atomic getAndPutIfAbsent on the
    DistributedMapCache): actor-pool ``map_batches`` stage appending
    ``is_first`` (True = this row's key was unseen across the WHOLE
    pipeline, any actor, any batch). The cache is the cross-pipeline
    shared state a hash-partitioned groupby can't express — e.g.
    deduplicating a live stream against everything already ingested.
    One batched RPC per (batch × shard), never per row."""

    def __init__(
        self,
        cache_name: str,
        key_col: str = "key",
        shards: int = 2,
        max_entries: int = 10_000_000,
    ):
        self.client = CacheClient(
            name=cache_name, shards=shards, max_entries=max_entries
        )
        self.key_col = key_col

    def __call__(self, batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        keys = pc.cast(batch[self.key_col], pa.string()).to_pylist()
        first = self.client.put_if_absent_many(keys)
        return batch.append_column("is_first", pa.array(first, pa.bool_()))
