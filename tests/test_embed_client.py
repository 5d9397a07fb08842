"""V1 embedding-client guard tests (test_embedding_client.ml vectors +
retry semantics)."""

import pytest

from chessmate_spark.functions.embed_client import (
    EmbeddingClient,
    TransportError,
    chunk_list,
    enforce_char_limit,
    plan_batches,
    total_chars,
)
from chessmate_spark.functions.resilience import RetryExhausted


def test_chunk_list_splits_correctly():
    data = [str(i) for i in range(10)]
    chunks = chunk_list(data, 3)
    assert chunks == [["0", "1", "2"], ["3", "4", "5"], ["6", "7", "8"], ["9"]]


def test_enforce_char_limit_reference_vector():
    chunk = ["a" * 10, "b" * 20, "c" * 15]
    chunks = enforce_char_limit(chunk, 25)
    assert len(chunks) == 3
    assert all(total_chars(c) <= 25 for c in chunks)


def test_enforce_char_limit_keeps_single_oversized_item():
    assert enforce_char_limit(["x" * 1000], 25) == [["x" * 1000]]


def test_plan_batches_composes_both_guards():
    texts = ["a" * 30] * 5
    batches = plan_batches(texts, max_batch_size=4, max_chars=70)
    # size chunking: [4, 1]; char limit splits the 120-char first chunk
    assert [len(b) for b in batches] == [2, 2, 1]
    assert sum(len(b) for b in batches) == 5


def test_embed_texts_preserves_order_and_counts_batches():
    calls = []

    def transport(batch):
        calls.append(list(batch))
        return [[float(len(t))] for t in batch]

    client = EmbeddingClient(transport, max_batch_size=2, max_chars=1000)
    out = client.embed_texts(["a", "bb", "ccc", "dddd", "e"])
    assert out == [[1.0], [2.0], [3.0], [4.0], [1.0]]
    assert client.batches_sent == 3
    assert [len(c) for c in calls] == [2, 2, 1]


def test_transient_statuses_retry_then_succeed():
    attempts = {"n": 0}

    def transport(batch):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise TransportError(429, "rate limited")
        return [[0.0]] * len(batch)

    sleeps = []
    client = EmbeddingClient(
        transport, max_attempts=4, initial_delay=0.5, multiplier=2.0,
        jitter=0.0, sleep=sleeps.append,
    )
    out = client.embed_texts(["x"])
    assert len(out) == 1
    assert client.retries == 2
    assert sleeps == pytest.approx([0.5, 1.0])


def test_non_transient_status_raises_immediately():
    def transport(batch):
        raise TransportError(401, "bad key")

    client = EmbeddingClient(transport, sleep=lambda s: None)
    with pytest.raises(TransportError):
        client.embed_texts(["x"])
    assert client.retries == 0


def test_retry_exhaustion_surfaces():
    def transport(batch):
        raise TransportError(503, "down")

    client = EmbeddingClient(
        transport, max_attempts=2, initial_delay=0.0, jitter=0.0,
        sleep=lambda s: None,
    )
    with pytest.raises(RetryExhausted):
        client.embed_texts(["x"])
