import time

import pyarrow as pa

from nifi_ray.stages.control import RateLimitedStage, TokenBucket


def test_token_bucket_caps_rate():
    b = TokenBucket(rate=1000, burst=100)
    t0 = time.monotonic()
    total = 0
    while total < 500:
        b.acquire(100)
        total += 100
    elapsed = time.monotonic() - t0
    # 500 units at 1000/s with 100 burst → ≥ ~0.4s
    assert elapsed >= 0.35


def test_rate_limited_stage_passthrough():
    stage = RateLimitedStage(None, rows_per_sec=1e9)
    t = pa.table({"x": [1, 2, 3]})
    assert stage(t).equals(t)

    calls = []
    stage2 = RateLimitedStage(lambda b: calls.append(1) or b, rows_per_sec=1e9)
    stage2(t)
    assert calls == [1]
