"""Agent-call resilience: circuit breaker, retry with backoff, timeout.

Driver-side guard rails for the external-evaluator path (X7/X8).  In the
reference these wrap the GPT-5 HTTP calls; here they wrap whatever
``evaluate`` callable feeds the blend/cache operators.  All three are
deterministic state machines with injectable clock / sleep / random so the
tests pin exact behavior (reference: lib/query/agent_circuit_breaker.ml,
lib/core/retry.ml, config.ml:98-102 defaults 5 failures / 60 s cooloff /
15 s timeout; tests: test_agent_circuit_breaker.ml, test_retry.ml).

These guards protect a DRIVER-SIDE dependency (one shared client), not a
per-row operation — nothing here runs inside a Spark task.  Executors see
only the materialized evaluation results (x7/x8 join them as a table).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass
from typing import Any, Callable, Generic, List, Optional, Tuple, TypeVar, Union

T = TypeVar("T")

DEFAULT_AGENT_TIMEOUT_SECONDS = 15.0
DEFAULT_BREAKER_THRESHOLD = 5
DEFAULT_BREAKER_COOLOFF_SECONDS = 60.0

DISABLED = "disabled"
CLOSED = "closed"
HALF_OPEN = "half_open"
OPEN = "open"


class CircuitBreaker:
    """Failure-counting breaker: closed → open after ``threshold``
    consecutive failures, half-open after ``cooloff_seconds``, closed again
    on the next success.  ``threshold <= 0`` disables it entirely."""

    def __init__(
        self,
        now_fn: Callable[[], float] = time.time,
        metrics_hook: Optional[Callable[[bool], None]] = None,
    ) -> None:
        self._now = now_fn
        self._metrics = metrics_hook or (lambda open_: None)
        self.enabled = False
        self.threshold = 0
        self.cooloff = 0.0
        self.failure_count = 0
        self.open_until: Optional[float] = None
        self.half_open = False

    def configure(self, threshold: int, cooloff_seconds: float) -> None:
        self.enabled = threshold > 0
        self.threshold = threshold if self.enabled else 0
        self.cooloff = cooloff_seconds if self.enabled else 0.0
        self.failure_count = 0
        self.open_until = None
        self.half_open = False
        self._metrics(False)

    def current_status(self) -> str:
        if not self.enabled:
            return DISABLED
        if self.open_until is not None:
            if self._now() < self.open_until:
                return OPEN
            return HALF_OPEN
        return HALF_OPEN if self.half_open else CLOSED

    def should_allow(self) -> bool:
        if not self.enabled:
            return True
        if self.open_until is not None:
            if self._now() < self.open_until:
                return False
            # cooloff elapsed: let ONE probe through (half-open)
            self.open_until = None
            self.half_open = True
            self._metrics(False)
            return True
        return True

    def record_success(self) -> None:
        if self.enabled:
            self.failure_count = 0
            self.open_until = None
            self.half_open = False
            self._metrics(False)

    def record_failure(self) -> None:
        if self.enabled:
            self.failure_count += 1
            self.half_open = False
            if self.failure_count >= self.threshold:
                self.failure_count = 0
                self.open_until = self._now() + self.cooloff
                self._metrics(True)


@dataclass
class Resolved(Generic[T]):
    """Attempt outcome: final (success or non-retryable failure)."""

    value: T


@dataclass
class Retry:
    """Attempt outcome: transient failure, try again."""

    error: str


class RetryExhausted(RuntimeError):
    """Raised when all attempts returned Retry; carries the last error."""


def apply_jitter(jitter: float, random_fn: Callable[[], float], delay: float) -> float:
    if jitter <= 0.0:
        return delay
    offset = (random_fn() * (2.0 * jitter)) - jitter
    return max(0.0, delay * (1.0 + offset))


def with_backoff(
    f: Callable[[int], Union[Resolved, Retry]],
    max_attempts: int,
    initial_delay: float,
    multiplier: float,
    jitter: float,
    max_delay: float = float("inf"),
    sleep: Callable[[float], None] = time.sleep,
    random_fn: Optional[Callable[[], float]] = None,
    on_retry: Optional[Callable[[int, float, str], None]] = None,
) -> Any:
    """Exponential backoff around ``f(attempt)`` (1-based attempts).

    ``f`` returns Resolved(value) to stop or Retry(error) to back off and
    go again; after ``max_attempts`` Retries, raises RetryExhausted(error).
    Delay_n = initial * multiplier^(n-1), clamped at max_delay, jittered by
    a uniform factor in [1-jitter, 1+jitter].
    """
    if max_attempts < 1:
        raise ValueError("with_backoff: max_attempts must be >= 1")
    if random_fn is None:
        import random as _random

        random_fn = _random.random
    attempt = 1
    current_delay = max(0.0, initial_delay)
    while True:
        outcome = f(attempt)
        if isinstance(outcome, Resolved):
            return outcome.value
        if not isinstance(outcome, Retry):
            raise TypeError(f"attempt must return Resolved or Retry, got {outcome!r}")
        if attempt >= max_attempts:
            raise RetryExhausted(outcome.error)
        jittered = apply_jitter(jitter, random_fn, current_delay)
        if on_retry is not None:
            on_retry(attempt, jittered, outcome.error)
        sleep(jittered)
        current_delay = min(max_delay, current_delay * multiplier)
        attempt += 1


class AgentTimeout(RuntimeError):
    """Raised when the evaluator call exceeds its deadline."""


def run_with_timeout(
    fn: Callable[[], T], timeout_seconds: float = DEFAULT_AGENT_TIMEOUT_SECONDS
) -> T:
    """Run ``fn`` with a wall-clock deadline (config.ml:98 — 15 s default).

    The reference cancels the in-flight HTTP request; a Python callable
    can't be force-killed, so the worker runs on a true DAEMON thread: a
    hung ``fn`` is abandoned and cannot block interpreter shutdown.
    (ThreadPoolExecutor is wrong here — its workers are non-daemon and
    its atexit hook joins them, so one hung call would wedge exit.)
    """
    result: List[Any] = []
    error: List[BaseException] = []

    def _target() -> None:
        try:
            result.append(fn())
        except BaseException as exc:  # propagated to the caller below
            error.append(exc)

    worker = threading.Thread(target=_target, daemon=True)
    worker.start()
    worker.join(timeout=timeout_seconds)
    if worker.is_alive():
        raise AgentTimeout(
            f"agent call exceeded {timeout_seconds:g}s deadline"
        )
    if error:
        raise error[0]
    return result[0]


def guarded_evaluate(
    breaker: CircuitBreaker,
    evaluate: Callable[[], T],
    timeout_seconds: float = DEFAULT_AGENT_TIMEOUT_SECONDS,
    fallback: Optional[Callable[[], T]] = None,
) -> Tuple[Optional[T], str]:
    """One guarded agent call: breaker gate → timeout-bounded call →
    success/failure accounting.  Returns (value, note) where note is one of
    'ok', 'breaker_open', 'timeout', 'error'; on non-ok the fallback value
    (or None) is returned — the V7 degrade-don't-fail contract."""
    if not breaker.should_allow():
        return (fallback() if fallback else None), "breaker_open"
    try:
        value = run_with_timeout(evaluate, timeout_seconds)
    except AgentTimeout:
        breaker.record_failure()
        return (fallback() if fallback else None), "timeout"
    except Exception:
        breaker.record_failure()
        return (fallback() if fallback else None), "error"
    breaker.record_success()
    return value, "ok"


def backoff_schedule(
    max_attempts: int,
    initial_delay: float,
    multiplier: float,
    max_delay: float = float("inf"),
) -> List[float]:
    """The deterministic (jitter-free) sleep schedule with_backoff would
    use: delays before attempts 2..max_attempts.  Oracle-checkable."""
    out: List[float] = []
    delay = max(0.0, initial_delay)
    for _ in range(max_attempts - 1):
        out.append(delay)
        delay = min(max_delay, delay * multiplier)
    return out
