"""Parity tests for the agent guard rails.

Mirrors reference test vectors: test_agent_circuit_breaker.ml (disabled /
open / half-open cycle) and test_retry.ml (sleep sequence, exhaustion,
jitter factors).
"""

import pytest

from chessmate_spark.functions.resilience import (
    AgentTimeout,
    CircuitBreaker,
    Resolved,
    Retry,
    RetryExhausted,
    apply_jitter,
    backoff_schedule,
    guarded_evaluate,
    run_with_timeout,
    with_backoff,
)


class FakeClock:
    def __init__(self, t=0.0):
        self.t = t

    def __call__(self):
        return self.t


# --- circuit breaker (test_agent_circuit_breaker.ml) -----------------------

def test_disabled_breaker_allows_everything():
    b = CircuitBreaker(now_fn=FakeClock())
    b.configure(threshold=0, cooloff_seconds=30.0)
    assert b.should_allow() is True
    b.record_failure()
    assert b.should_allow() is True
    assert b.current_status() == "disabled"


def test_open_half_open_cycle():
    clock = FakeClock(100.0)
    b = CircuitBreaker(now_fn=clock)
    b.configure(threshold=2, cooloff_seconds=0.05)
    assert b.should_allow() is True
    b.record_failure()
    assert b.should_allow() is True  # below threshold
    b.record_failure()
    assert b.should_allow() is False  # threshold reached -> open
    assert b.current_status() == "open"
    clock.t += 0.06  # cooloff elapses
    assert b.should_allow() is True  # one probe allowed
    assert b.current_status() == "half_open"
    b.record_success()
    assert b.current_status() == "closed"


def test_half_open_failure_reopens_after_threshold():
    clock = FakeClock()
    b = CircuitBreaker(now_fn=clock)
    b.configure(threshold=1, cooloff_seconds=10.0)
    b.record_failure()
    assert b.current_status() == "open"
    clock.t += 11.0
    assert b.should_allow() is True  # half-open probe
    b.record_failure()  # probe failed -> immediately open again
    assert b.current_status() == "open"
    assert b.should_allow() is False


def test_metrics_hook_tracks_open_state():
    events = []
    b = CircuitBreaker(now_fn=FakeClock(), metrics_hook=events.append)
    b.configure(threshold=1, cooloff_seconds=5.0)
    b.record_failure()
    assert events == [False, True]  # configure -> closed, trip -> open
    b.configure(threshold=1, cooloff_seconds=5.0)
    assert events[-1] is False


def test_reconfigure_resets_state():
    clock = FakeClock()
    b = CircuitBreaker(now_fn=clock)
    b.configure(threshold=1, cooloff_seconds=100.0)
    b.record_failure()
    assert b.should_allow() is False
    b.configure(threshold=3, cooloff_seconds=1.0)
    assert b.should_allow() is True
    assert b.current_status() == "closed"


# --- retry with backoff (test_retry.ml) ------------------------------------

def test_retries_until_success_sleep_sequence():
    sleeps = []
    callbacks = []

    def f(attempt):
        if attempt == 1:
            return Retry("transient 1")
        if attempt == 2:
            return Retry("transient 2")
        return Resolved("ok")

    out = with_backoff(
        f,
        max_attempts=5,
        initial_delay=0.1,
        multiplier=2.0,
        jitter=0.0,
        sleep=sleeps.append,
        on_retry=lambda attempt, delay, err: callbacks.append((attempt, delay, err)),
    )
    assert out == "ok"
    assert sleeps == pytest.approx([0.1, 0.2])
    assert callbacks == [
        (1, pytest.approx(0.1), "transient 1"),
        (2, pytest.approx(0.2), "transient 2"),
    ]


def test_exhausts_attempts():
    attempts = []

    def f(attempt):
        attempts.append(attempt)
        return Retry("always failing")

    with pytest.raises(RetryExhausted, match="always failing"):
        with_backoff(
            f, max_attempts=3, initial_delay=0.05, multiplier=1.5, jitter=0.0,
            sleep=lambda s: None,
        )
    assert attempts == [1, 2, 3]


def test_applies_jitter_reference_factors():
    # reference vector: jitter 0.3, randoms 0.75 then 0.25 ->
    # factors 1.15 and 0.85 over delays 0.2 and 0.4
    sleeps = []
    randoms = iter([0.75, 0.25])

    def f(attempt):
        return Retry("transient") if attempt < 3 else Resolved(None)

    with_backoff(
        f, max_attempts=3, initial_delay=0.2, multiplier=2.0, jitter=0.3,
        sleep=sleeps.append, random_fn=lambda: next(randoms, 0.5),
    )
    assert sleeps == pytest.approx([0.2 * 1.15, 0.4 * 0.85])


def test_max_delay_clamps_growth():
    assert backoff_schedule(5, 1.0, 10.0, max_delay=3.0) == [1.0, 3.0, 3.0, 3.0]


def test_jitter_never_negative():
    assert apply_jitter(1.0, lambda: 0.0, 5.0) == 0.0


def test_invalid_max_attempts():
    with pytest.raises(ValueError):
        with_backoff(lambda a: Resolved(1), 0, 0.1, 2.0, 0.0)


# --- timeout + guarded evaluate --------------------------------------------

def test_run_with_timeout_passes_value():
    assert run_with_timeout(lambda: 42, timeout_seconds=5.0) == 42


def test_run_with_timeout_raises():
    import time as _time

    with pytest.raises(AgentTimeout):
        run_with_timeout(lambda: _time.sleep(2.0), timeout_seconds=0.05)


def test_guarded_evaluate_records_and_degrades():
    b = CircuitBreaker(now_fn=FakeClock())
    b.configure(threshold=2, cooloff_seconds=60.0)

    def boom():
        raise RuntimeError("api down")

    val, note = guarded_evaluate(b, boom, fallback=lambda: "fb")
    assert (val, note) == ("fb", "error")
    val, note = guarded_evaluate(b, boom, fallback=lambda: "fb")
    assert (val, note) == ("fb", "error")
    # two failures tripped the breaker: calls now short-circuit
    val, note = guarded_evaluate(b, lambda: "never", fallback=lambda: "fb")
    assert (val, note) == ("fb", "breaker_open")


def test_guarded_evaluate_success_closes():
    clock = FakeClock()
    b = CircuitBreaker(now_fn=clock)
    b.configure(threshold=1, cooloff_seconds=30.0)
    guarded_evaluate(b, lambda: (_ for _ in ()).throw(RuntimeError()), fallback=lambda: 0)
    assert b.current_status() == "open"
    clock.t += 31.0
    val, note = guarded_evaluate(b, lambda: 7)
    assert (val, note) == (7, "ok")
    assert b.current_status() == "closed"
