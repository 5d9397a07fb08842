"""Per-client token-bucket rate limiter (request + body-byte buckets).

Reference: lib/api/rate_limiter.ml — refill-on-check token buckets keyed
by sanitized remote address, optional body-byte quota, idle-bucket
pruning, and the Prometheus exposition lines.  Deterministic (injectable
clock) and driver-side: in this engine it guards whatever front door
submits queries/jobs, exactly like the breaker guards the agent client.
Tested against the reference's own vectors (test_rate_limiter.ml).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Union


@dataclass
class Allowed:
    remaining: float


@dataclass
class Limited:
    retry_after: float
    remaining: float


Decision = Union[Allowed, Limited]


def sanitize_identifier(value: str) -> str:
    return "".join(
        ch if (ch.isalnum() or ch in "._:") else "_" for ch in value
    )


def normalize_remote_addr(addr: str) -> str:
    cleaned = addr.strip()
    return cleaned.lower() if cleaned else "unknown"


@dataclass
class _Bucket:
    tokens: float
    last_refill: float
    last_seen: float
    limited_count: int = 0
    body_tokens: float = 0.0
    body_limited_count: int = 0


class RateLimiter:
    def __init__(
        self,
        tokens_per_minute: int,
        bucket_size: int,
        idle_timeout: float = 600.0,
        prune_interval: float = 60.0,
        time_source: Callable[[], float] = time.time,
        body_bytes_per_minute: Optional[int] = None,
        body_bucket_size: Optional[int] = None,
    ) -> None:
        if tokens_per_minute <= 0:
            raise ValueError("tokens_per_minute must be positive")
        if bucket_size <= 0:
            raise ValueError("bucket_size must be positive")
        if idle_timeout <= 0 or prune_interval <= 0:
            raise ValueError("idle_timeout/prune_interval must be positive")
        if body_bytes_per_minute is None:
            if body_bucket_size is not None:
                raise ValueError("body_bucket_size requires body_bytes_per_minute")
            self.body_tokens_per_second: Optional[float] = None
            self.body_bucket_size: Optional[float] = None
        else:
            if body_bytes_per_minute <= 0:
                raise ValueError("body_bytes_per_minute must be positive")
            if body_bucket_size is not None and body_bucket_size <= 0:
                raise ValueError("body_bucket_size must be positive")
            self.body_tokens_per_second = body_bytes_per_minute / 60.0
            self.body_bucket_size = float(
                body_bucket_size if body_bucket_size is not None
                else body_bytes_per_minute
            )
        self.tokens_per_second = tokens_per_minute / 60.0
        self.bucket_size = float(bucket_size)
        self.idle_timeout = idle_timeout
        self.prune_interval = prune_interval
        self.now = time_source
        self.buckets: Dict[str, _Bucket] = {}
        self.total_limited = 0
        self.total_body_limited = 0
        self.last_prune = self.now()

    # -- internals ---------------------------------------------------------

    def _refill(self, bucket: _Bucket, now: float) -> None:
        elapsed = now - bucket.last_refill
        if elapsed > 0:
            bucket.tokens = min(
                self.bucket_size, bucket.tokens + elapsed * self.tokens_per_second
            )
            if self.body_tokens_per_second is not None:
                bucket.body_tokens = min(
                    self.body_bucket_size,
                    bucket.body_tokens + elapsed * self.body_tokens_per_second,
                )
            bucket.last_refill = now

    def _prune_if_needed(self, now: float) -> None:
        if now - self.last_prune >= self.prune_interval:
            self.last_prune = now
            stale = [
                key
                for key, b in self.buckets.items()
                if now - b.last_seen >= self.idle_timeout
            ]
            for key in stale:
                del self.buckets[key]

    def _ensure(self, key: str, now: float) -> _Bucket:
        bucket = self.buckets.get(key)
        if bucket is None:
            bucket = _Bucket(
                tokens=self.bucket_size,
                last_refill=now,
                last_seen=now,
                body_tokens=self.body_bucket_size or 0.0,
            )
            self.buckets[key] = bucket
        return bucket

    # -- public ------------------------------------------------------------

    def check(
        self, remote_addr: str, body_bytes: Optional[int] = None
    ) -> Decision:
        key = sanitize_identifier(normalize_remote_addr(remote_addr))
        now = self.now()
        self._prune_if_needed(now)
        bucket = self._ensure(key, now)
        self._refill(bucket, now)
        bucket.last_seen = now
        if body_bytes is not None and self.body_tokens_per_second is not None:
            body_cost: Optional[float] = float(max(0, body_bytes))
        else:
            body_cost = None
        has_token = bucket.tokens >= 1.0
        has_body = body_cost is None or bucket.body_tokens >= body_cost
        if has_token and has_body:
            bucket.tokens -= 1.0
            if body_cost:
                bucket.body_tokens = max(0.0, bucket.body_tokens - body_cost)
            return Allowed(remaining=bucket.tokens)
        request_retry = None
        if not has_token:
            deficit = 1.0 - bucket.tokens
            request_retry = (
                float("inf")
                if self.tokens_per_second == 0
                else deficit / self.tokens_per_second
            )
        body_retry = None
        if (
            body_cost is not None
            and self.body_tokens_per_second is not None
            and bucket.body_tokens < body_cost
        ):
            deficit = body_cost - bucket.body_tokens
            body_retry = (
                float("inf")
                if self.body_tokens_per_second == 0
                else deficit / self.body_tokens_per_second
            )
        bucket.limited_count += 1
        self.total_limited += 1
        if body_retry is not None:
            bucket.body_limited_count += 1
            self.total_body_limited += 1
        retry_after = max(request_retry or 0.0, body_retry or 0.0)
        return Limited(retry_after=retry_after, remaining=bucket.tokens)

    def metrics(self) -> List[str]:
        """Prometheus exposition lines, reference layout/order."""
        now = self.now()
        self._prune_if_needed(now)
        lines = [f"api_rate_limited_total {self.total_limited}"]
        lines += sorted(
            f'api_rate_limited_total{{ip="{key}"}} {b.limited_count}'
            for key, b in self.buckets.items()
            if b.limited_count
        )
        if self.body_tokens_per_second is not None:
            lines.append(
                f"api_rate_limited_body_total {self.total_body_limited}"
            )
            lines += sorted(
                f'api_rate_limited_body_total{{ip="{key}"}} {b.body_limited_count}'
                for key, b in self.buckets.items()
                if b.body_limited_count
            )
        return lines

    def active_bucket_count(self) -> int:
        self._prune_if_needed(self.now())
        return len(self.buckets)
