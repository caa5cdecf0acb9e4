"""Rate limiting — ControlRate semantics (reference
nifi-standard-processors/.../standard/ControlRate.java:70-84: throttle
by data rate / flowfile count / attribute-sum per time window).

Ray Data's streaming executor gives BACKPRESSURE natively (SURVEY.md
§4), so a throttle is NOT needed for pipeline stability — this exists
for the cases NiFi uses it for: protecting an external system behind an
egress stage. Implemented as a token bucket held by the actor pool
stage that talks to that system: each actor locally limits its own
throughput to rate/num_actors.
"""

from __future__ import annotations

import time

import pyarrow as pa


class TokenBucket:
    """units/sec with burst capacity; blocking acquire."""

    def __init__(self, rate: float, burst: float | None = None):
        self.rate = float(rate)
        self.capacity = float(burst if burst is not None else rate)
        self.tokens = self.capacity
        self.last = time.monotonic()

    def _refill(self):
        now = time.monotonic()
        self.tokens = min(self.capacity, self.tokens + (now - self.last) * self.rate)
        self.last = now

    def try_acquire(self, n: float = 1.0) -> bool:
        self._refill()
        if self.tokens >= n:
            self.tokens -= n
            return True
        return False

    def acquire(self, n: float = 1.0):
        while not self.try_acquire(n):
            self._refill()
            deficit = max(0.0, n - self.tokens)
            time.sleep(min(0.25, deficit / self.rate))


class RateLimitedStage:
    """Actor-pool wrapper: applies ``inner`` per batch, capped at
    ``rows_per_sec`` rows/sec PER ACTOR (size the pool so
    concurrency × rows_per_sec equals the external system's budget).

        ds.map_batches(RateLimitedStage,
                       fn_constructor_args=(my_fn, 1000.0),
                       batch_format="pyarrow", concurrency=4)
    """

    def __init__(self, inner, rows_per_sec: float, burst: float | None = None):
        self.inner = inner
        self.bucket = TokenBucket(rows_per_sec, burst)

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.bucket.acquire(batch.num_rows)
        return self.inner(batch) if self.inner is not None else batch
