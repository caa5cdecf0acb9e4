"""Cluster-derived knobs for shuffle/join parallelism and broadcast
byte budgets.

Round-2 review flagged fixture-scale constants (``num_partitions=2/4``
hash-join fan-out, a 500k candidate-pair cap that counted PAIRS rather
than bytes) hardcoded in query harnesses: right at sf0.01 on a laptop,
starving at 100× on a real cluster. Everything here derives from
``ray.cluster_resources()`` at call time so the same pipeline code
scales its exchanges with the cluster it lands on.
"""

from __future__ import annotations

import os


def cluster_cpus(default: int = 4) -> int:
    """Total cluster CPUs (the local default when Ray is not up —
    library code must never ray.init() as a side effect)."""
    try:
        import ray

        if ray.is_initialized():
            return max(1, int(ray.cluster_resources().get("CPU", default)))
    except Exception:
        pass
    return default


def join_partitions(min_parts: int = 2, per_cpu: float = 0.5) -> int:
    """Hash-join / shuffle partition count: ~one partition per two CPUs
    keeps every aggregator busy without over-fragmenting tiny inputs;
    floor of ``min_parts`` so single-CPU test runs still exercise the
    partitioned path."""
    return max(min_parts, int(cluster_cpus() * per_cpu))


def actor_pool_size(
    min_actors: int = 2, per_cpu: float = 1 / 16, cap: int = 64
) -> tuple[int, int]:
    """Autoscaling ``(min, max)`` bounds for a ``map_batches`` actor
    pool. A hardcoded ``concurrency=2`` is a fixture-scale constant: it
    pins a stateful stage to two actors on a 256-node cluster. The
    floor of ``min_actors`` keeps low-CPU test runs on the proven
    two-actor shape (and below the executor-deadlock regime the
    materialize() guards were added for). Tuple form = Ray autoscaling
    pool, so small inputs never pay actors they would not feed.

    The max curve (~1 actor per 16 CPUs) is MEASURED, not guessed: an
    A/B at 32 CPUs / sf0.1 in matched host windows (BASELINE.md,
    round 4) showed cpus/4 pools consistently SLOWER on one-shot query
    latency (minhash_pairs 4.59→6.50 s, knn_cosine 1.49→2.19 s) —
    pools are torn down per execution, so growth pays cold actor
    starts that exceed the stage's work at benchmark scale. cpus/16
    keeps a 32-CPU node at the measured optimum (2) while a 256-CPU
    cluster still scales to 16 actors. Long-running production stages
    that amortize startup can raise ``NIFI_RAY_ACTOR_POOL_MAX``."""
    cpus = cluster_cpus()
    # starvation guard (r5): a pipeline stacking TWO min-2 pools plus a
    # read task wants ≥5 CPUs just to start — on the 4-CPU pytest
    # session that reservation deadlocks the streaming executor (knn_ivf
    # stalled indefinitely once the schema-parity lint started running
    # every graded query under conftest's num_cpus=4). Below 8 CPUs the
    # floor drops to 1 so pools start immediately and autoscale up as
    # CPUs free; at ≥8 CPUs the measured two-actor optimum is unchanged.
    lo = min_actors if cpus >= 8 else 1
    env = os.environ.get("NIFI_RAY_ACTOR_POOL_MAX")
    if env:
        return (lo, max(lo, int(env)))
    # ceiling keeps the min_actors floor even when lo drops: the pool
    # may still autoscale up to the proven two-actor shape as CPUs free
    hi = max(min_actors, min(cap, int(cpus * per_cpu)))
    return (lo, hi)


def object_store_bytes(default: int = 2 << 30) -> int:
    try:
        import ray

        if ray.is_initialized():
            return int(
                ray.cluster_resources().get("object_store_memory", default)
            )
    except Exception:
        pass
    return default


def broadcast_budget_bytes() -> int:
    """How many bytes a driver-built broadcast lookup (ray.put once,
    read per task) may hold: 10% of the object store, capped at 1 GiB —
    beyond that a partitioned hash join beats re-reading a giant
    broadcast from plasma on every task."""
    env = os.environ.get("NIFI_RAY_BROADCAST_BUDGET")
    if env:
        return int(env)
    return min(object_store_bytes() // 10, 1 << 30)


def parquet_avg_row_bytes(path_or_paths, columns: list[str] | None = None) -> float:
    """Mean on-disk bytes per row from parquet FOOTER metadata only
    (optionally restricted to named columns) — the cheap estimator for
    byte-budgeted decisions like 'can these candidate texts fit in a
    broadcast dict'. Compressed size is the conservative (under-)
    estimate of in-memory size, so callers should keep budget headroom."""
    import glob

    import pyarrow.parquet as pq

    if isinstance(path_or_paths, str):
        if os.path.isdir(path_or_paths):
            paths = sorted(glob.glob(os.path.join(path_or_paths, "*.parquet")))
        else:
            paths = [path_or_paths]
    else:
        paths = list(path_or_paths)
    total = 0
    rows = 0
    for p in paths:
        md = pq.ParquetFile(p).metadata
        rows += md.num_rows
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema.split(".")[0]
                if columns is None or name in columns:
                    total += col.total_compressed_size
    return total / max(rows, 1)
