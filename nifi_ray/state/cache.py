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

    def contains(self, key: str) -> bool:
        return ray.get(self._shard(key).contains.remote(key))

    def remove(self, key: str) -> bool:
        return ray.get(self._shard(key).remove.remote(key))

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def shutdown(self):
        for a in self.shards:
            ray.kill(a)
