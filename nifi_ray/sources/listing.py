"""Incremental file-listing source — ListFile/FetchFile semantics.

Recreates the reference's list-then-fetch pattern (reference
nifi-standard-processors/.../standard/AbstractListProcessor.java:148-316,
ListFile.java, FetchFile.java):

- a LISTING WATERMARK (`listing.timestamp`) so only files newer than the
  last run are emitted;
- the tie-breaker set: files AT the watermark timestamp already
  processed are remembered and skipped, because a new file can land
  with the same mtime (reference AbstractListProcessor.java:160-227 —
  'identifiers processed at that timestamp');
- checkpointed state that survives restarts (NiFi: StateManager
  Scope.CLUSTER; here: a JSON file, single writer = driver — the same
  role as primary-node-only listing, reference ListFile.java:151).

The listing runs on the DRIVER (cheap metadata walk); the FETCH is the
distributed part — `ray.data.read_*` over the new files.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field


@dataclass
class ListingState:
    listed_timestamp: float = -1.0
    ids_at_timestamp: list[str] = field(default_factory=list)

    @staticmethod
    def load(path: str) -> "ListingState":
        if not os.path.exists(path):
            return ListingState()
        with open(path) as f:
            d = json.load(f)
        return ListingState(d["listed_timestamp"], d["ids_at_timestamp"])

    def save(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "listed_timestamp": self.listed_timestamp,
                    "ids_at_timestamp": self.ids_at_timestamp,
                },
                f,
            )
        os.replace(tmp, path)


def list_new_files(
    dir_path: str,
    state_path: str,
    suffix: str = ".parquet",
    commit: bool = True,
) -> list[str]:
    """Return files not yet listed (mtime watermark + same-mtime dedup),
    then advance the checkpoint (unless commit=False — NiFi's
    'commit only after session succeeds' ordering: list, process, THEN
    call again with commit=True or save manually)."""
    st = ListingState.load(state_path)
    entries = []
    for name in sorted(os.listdir(dir_path)):
        if not name.endswith(suffix):
            continue
        full = os.path.join(dir_path, name)
        mtime = os.stat(full).st_mtime
        entries.append((full, mtime))

    new: list[str] = []
    max_ts = st.listed_timestamp
    for full, mtime in entries:
        if mtime < st.listed_timestamp:
            continue
        if mtime == st.listed_timestamp and full in st.ids_at_timestamp:
            continue
        new.append(full)
        max_ts = max(max_ts, mtime)

    if commit and new:
        ids_at_max = [f for f, m in entries if m == max_ts]
        ListingState(max_ts, ids_at_max).save(state_path)
    return new


# ---- graded fixture corpus ------------------------------------------

LISTING_FIXTURE_BASE = 1_700_000_000  # pinned mtimes — watermark math is exact


def listing_fixture_content(i: int) -> bytes:
    """Deterministic payload for fixture file ``i`` — shared by the
    graded listing_watermark query and its expected-oracle builder."""
    return bytes((j * (2 * i + 5) + i) % 256 for j in range(40 + 3 * i))


def listing_fixture_write(dir_path: str, ids) -> None:
    """Write fixture files with PINNED mtimes: files 0..9 pair up on
    five timestamps (exercising the same-mtime tie-breaker set), file
    10 lands AT the pass-1 watermark (must still be emitted — it is
    not in the remembered id set), file 11 lands past it."""
    for i in ids:
        p = os.path.join(dir_path, f"f{i:03d}.bin")
        with open(p, "wb") as f:
            f.write(listing_fixture_content(i))
        ts = LISTING_FIXTURE_BASE + (i // 2 if i < 10 else (4 if i == 10 else 5))
        os.utime(p, (ts, ts))
