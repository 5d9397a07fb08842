"""Property-based tests (hypothesis) for the pure layers.

These pin CONTRACTS, not examples: the precheck/splitter never raise on
arbitrary input (the reference's fold_games never aborts a file), guards
respect their bounds, batching covers its input exactly once, the token
bucket never over-admits, and the retry schedule is monotone.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from chessmate_spark.chess.pgn import split_games
from chessmate_spark.chess.precheck import precheck_game, precheck_text, truncate_preview
from chessmate_spark.functions.embed_client import (
    enforce_char_limit,
    plan_batches,
    total_chars,
)
from chessmate_spark.functions.guards import (
    classify_theme_py,
    sanitize_py,
    truncate_pgn_py,
)
from chessmate_spark.functions.rate_limiter import Allowed, RateLimiter
from chessmate_spark.functions.resilience import backoff_schedule

text_strategy = st.text(max_size=400)


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_precheck_never_raises(raw):
    # corrupt-record contract: any text becomes issues, never an exception
    for game_no, problem_no, problem, hint, preview in precheck_text(raw):
        assert game_no >= 1 and problem_no >= 1
        assert problem and hint
        assert len(preview) <= 81


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_split_games_loses_no_content_lines(raw):
    chunks = split_games(raw)
    # every non-empty input line survives in exactly one chunk (split is a
    # partition of the content, modulo surrounding blank lines)
    joined = "\n".join(chunks)
    for line in raw.splitlines():
        if line.strip():
            assert line.strip() in joined


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_preview_bound(raw):
    out = truncate_preview(raw)
    assert len(out) <= 81
    assert out == raw.strip() or out[:-1] == raw.strip()[:80]


@given(st.text(max_size=5000), st.integers(min_value=1, max_value=100))
@settings(max_examples=100, deadline=None)
def test_truncate_pgn_bound_and_prefix(pgn, cap):
    out = truncate_pgn_py(pgn, max_chars=cap)
    if len(pgn) <= cap:
        assert out == pgn
    else:
        assert out == pgn[:cap] + "\n... [PGN truncated]"


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_sanitize_idempotent(text):
    once = sanitize_py(text)
    assert sanitize_py(once) == once


@given(st.lists(st.text(alphabet="ab ", max_size=30), max_size=8))
@settings(max_examples=200, deadline=None)
def test_theme_classifier_total(tags):
    assert classify_theme_py(tags) in {
        "unknown", "kingside_attack", "queenside_majority", "central_break"
    }


@given(
    st.lists(st.text(min_size=0, max_size=50), max_size=60),
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=5, max_value=200),
)
@settings(max_examples=200, deadline=None)
def test_plan_batches_partitions_input_in_order(texts, batch, chars):
    batches = plan_batches(texts, max_batch_size=batch, max_chars=chars)
    flat = [t for b in batches for t in b]
    assert flat == list(texts)
    for b in batches:
        assert len(b) <= batch
        assert total_chars(b) <= chars or len(b) == 1


@given(st.lists(st.text(min_size=0, max_size=80), min_size=1, max_size=30),
       st.integers(min_value=1, max_value=100))
@settings(max_examples=200, deadline=None)
def test_enforce_char_limit_only_splits(chunk, max_chars):
    out = enforce_char_limit(list(chunk), max_chars)
    assert [t for b in out for t in b] == list(chunk)


@given(
    st.integers(min_value=1, max_value=8),
    st.floats(min_value=0.0, max_value=5.0, allow_nan=False),
    st.floats(min_value=1.0, max_value=4.0, allow_nan=False),
    st.floats(min_value=0.1, max_value=100.0, allow_nan=False),
)
@settings(max_examples=200, deadline=None)
def test_backoff_schedule_monotone_and_clamped(attempts, initial, mult, cap):
    sched = backoff_schedule(attempts, initial, mult, max_delay=cap)
    assert len(sched) == attempts - 1
    # reference semantics: the INITIAL delay is taken as-is; the clamp
    # applies from the first multiplication on — so monotonicity holds
    # whenever initial <= cap, and nothing ever exceeds max(initial, cap)
    if initial <= cap:
        for a, b in zip(sched, sched[1:]):
            assert b >= a - 1e-12
    for d in sched:
        assert d <= max(initial, cap) + 1e-12
    for d in sched[1:]:
        assert d <= cap + 1e-12


@given(st.lists(st.floats(min_value=0.0, max_value=10.0, allow_nan=False),
                min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_token_bucket_never_over_admits(gaps):
    # token-bucket safety: admissions <= bucket_size + refilled tokens + 1
    rate_per_min = 60  # 1 token/sec
    limiter_clock = {"t": 0.0}
    limiter = RateLimiter(
        tokens_per_minute=rate_per_min, bucket_size=3,
        time_source=lambda: limiter_clock["t"],
    )
    allowed = 0
    for gap in gaps:
        limiter_clock["t"] += gap
        if isinstance(limiter.check("1.2.3.4"), Allowed):
            allowed += 1
    elapsed = sum(gaps)
    assert allowed <= 3 + elapsed * 1.0 + 1
