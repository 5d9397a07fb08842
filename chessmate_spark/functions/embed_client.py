"""V1: batched embedding client — chunk guards, retry, pluggable transport.

Reference: lib/embedding/embedding_client.ml:12-56 (chunk ≤2048 items,
≤120k chars via recursive halving), 134-210 (retry on 429/5xx through
Retry.with_backoff).  The external API itself is NOT modeled — correctness
runs use the deterministic V5 embedding — but the batching/guard/retry
semantics are the reference's, unit-tested against its vectors
(test_embedding_client.ml).

In the Spark pipeline this runs INSIDE a mapInPandas stage: each executor
batch plans its API calls with ``plan_batches`` and pushes them through
its own client, so request shaping is identical from 1 to 1000 workers.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

from .resilience import Resolved, Retry, with_backoff

DEFAULT_MAX_BATCH_SIZE = 2048
DEFAULT_MAX_CHARS = 120_000

TRANSIENT_STATUSES = frozenset({429, 500, 502, 503, 504})


def chunk_list(items: Sequence[str], chunk_size: int) -> List[List[str]]:
    """Fixed-size chunks, last one ragged (embedding_client.ml chunk_list)."""
    return [list(items[i : i + chunk_size]) for i in range(0, len(items), chunk_size)]


def total_chars(chunk: Sequence[str]) -> int:
    return sum(len(s) for s in chunk)


def enforce_char_limit(chunk: List[str], max_chars: int) -> List[List[str]]:
    """Recursive halving until every sub-chunk fits ``max_chars``; a single
    oversized item is kept whole (the API gets to reject it)."""
    if total_chars(chunk) <= max_chars:
        return [chunk]
    if len(chunk) <= 1:
        return [chunk] if chunk else []
    left_len = max(1, len(chunk) // 2)
    left, right = chunk[:left_len], chunk[left_len:]
    return enforce_char_limit(left, max_chars) + enforce_char_limit(
        right, max_chars
    )


def plan_batches(
    texts: Sequence[str],
    max_batch_size: int = DEFAULT_MAX_BATCH_SIZE,
    max_chars: int = DEFAULT_MAX_CHARS,
) -> List[List[str]]:
    """The exact request batching the reference client sends: size-chunk
    first, then char-limit halving inside each chunk."""
    out: List[List[str]] = []
    for chunk in chunk_list(texts, max_batch_size):
        out.extend(enforce_char_limit(chunk, max_chars))
    return out


class TransportError(RuntimeError):
    """HTTP-ish failure from the transport; carries the status code."""

    def __init__(self, status: int, body: str = "") -> None:
        super().__init__(f"embedding transport status {status}: {body[:200]}")
        self.status = status


class EmbeddingClient:
    """Batch embedder with the reference's guards.

    ``transport(batch) -> list[vector]`` is injected: the real deployment
    posts to the embeddings API; tests and the correctness path inject the
    deterministic V5 embedder.  Transient statuses retry with exponential
    backoff; anything else raises immediately.
    """

    def __init__(
        self,
        transport: Callable[[List[str]], List[List[float]]],
        max_batch_size: int = DEFAULT_MAX_BATCH_SIZE,
        max_chars: int = DEFAULT_MAX_CHARS,
        max_attempts: int = 4,
        initial_delay: float = 0.5,
        multiplier: float = 2.0,
        jitter: float = 0.1,
        sleep: Callable[[float], None] = None,  # type: ignore[assignment]
    ) -> None:
        import time as _time

        self.transport = transport
        self.max_batch_size = max_batch_size
        self.max_chars = max_chars
        self.max_attempts = max_attempts
        self.initial_delay = initial_delay
        self.multiplier = multiplier
        self.jitter = jitter
        self.sleep = sleep if sleep is not None else _time.sleep
        self.batches_sent = 0
        self.retries = 0

    def _send(self, batch: List[str]) -> List[List[float]]:
        def attempt(_n: int):
            try:
                return Resolved(self.transport(batch))
            except TransportError as exc:
                if exc.status in TRANSIENT_STATUSES:
                    self.retries += 1
                    return Retry(str(exc))
                raise

        return with_backoff(
            attempt,
            max_attempts=self.max_attempts,
            initial_delay=self.initial_delay,
            multiplier=self.multiplier,
            jitter=self.jitter,
            sleep=self.sleep,
        )

    def embed_texts(self, texts: Sequence[str]) -> List[List[float]]:
        """Embed in planned batches; output order matches input order."""
        vectors: List[List[float]] = []
        for batch in plan_batches(texts, self.max_batch_size, self.max_chars):
            vectors.extend(self._send(batch))
            self.batches_sent += 1
        return vectors
