"""Rate-limiter parity tests (lib/api/rate_limiter.ml, test_rate_limiter.ml)."""

import pytest

from chessmate_spark.functions.rate_limiter import Allowed, Limited, RateLimiter


class Clock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_allows_request_under_budget():
    limiter = RateLimiter(tokens_per_minute=30, bucket_size=5)
    decision = limiter.check("192.168.0.1")
    assert isinstance(decision, Allowed)
    assert decision.remaining >= 0.0


def test_limits_when_tokens_exhausted_and_metrics():
    limiter = RateLimiter(tokens_per_minute=60, bucket_size=1)
    limiter.check("10.0.0.5")
    decision = limiter.check("10.0.0.5")
    assert isinstance(decision, Limited)
    assert decision.retry_after >= 0.0
    assert decision.remaining >= 0.0
    metrics = limiter.metrics()
    assert "api_rate_limited_total 1" in metrics
    assert any('ip="10.0.0.5"' in line and line.endswith(" 1") for line in metrics)


def test_prunes_stale_buckets():
    clock = Clock()
    limiter = RateLimiter(
        tokens_per_minute=10, bucket_size=1,
        idle_timeout=1.5, prune_interval=0.5, time_source=clock,
    )
    limiter.check("1.1.1.1")
    limiter.check("2.2.2.2")
    assert limiter.active_bucket_count() == 2
    clock.t += 2.0
    limiter.check("3.3.3.3")
    assert limiter.active_bucket_count() == 1
    # a pruned client comes back with a fresh bucket
    assert isinstance(limiter.check("1.1.1.1"), Allowed)


def test_body_quota_enforced():
    limiter = RateLimiter(
        tokens_per_minute=100, bucket_size=100,
        body_bytes_per_minute=1_000_000, body_bucket_size=1_000_000,
    )
    assert isinstance(limiter.check("8.8.8.8", body_bytes=600_000), Allowed)
    decision = limiter.check("8.8.8.8", body_bytes=600_000)
    assert isinstance(decision, Limited)
    assert decision.retry_after > 0.0
    assert "api_rate_limited_body_total 1" in limiter.metrics()


def test_refill_restores_tokens():
    clock = Clock()
    limiter = RateLimiter(
        tokens_per_minute=60, bucket_size=1, time_source=clock
    )
    assert isinstance(limiter.check("9.9.9.9"), Allowed)
    assert isinstance(limiter.check("9.9.9.9"), Limited)
    clock.t += 1.0  # 60/min -> one token per second
    assert isinstance(limiter.check("9.9.9.9"), Allowed)


def test_identifier_sanitization():
    limiter = RateLimiter(tokens_per_minute=60, bucket_size=1)
    limiter.check("  BAD addr!/7  ")
    limiter.check("bad_addr!_7")  # sanitizes to the same key
    assert limiter.active_bucket_count() == 1


def test_invalid_configs_rejected():
    with pytest.raises(ValueError):
        RateLimiter(tokens_per_minute=0, bucket_size=1)
    with pytest.raises(ValueError):
        RateLimiter(tokens_per_minute=60, bucket_size=1, body_bucket_size=10)
