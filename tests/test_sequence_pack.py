"""Sequence packing: prefix-sum offsets and chunk ids per shard."""

from __future__ import annotations

from chessmate_spark.operators.textan import sequence_pack


def test_offsets_and_seq_ids(spark):
    rows = [
        (1, "a b c", "s1"),        # 3 tokens, offset 0, seq 0
        (2, "d e", "s1"),          # 2 tokens, offset 3, seq 0
        (3, "f g h i", "s1"),      # 4 tokens, offset 5, seq 1 (cap 5)
        (4, "x", "s2"),            # other shard restarts at 0
        (5, None, "s2"),           # null text = 0 tokens
        (6, "y z", "s2"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {
        r["doc_id"]: r
        for r in sequence_pack(df, "doc_id", "text", "source", capacity=5)
        .collect()
    }
    assert (out[1]["tok_offset"], out[1]["seq_id"]) == (0, 0)
    assert (out[2]["tok_offset"], out[2]["seq_id"]) == (3, 0)
    assert (out[3]["tok_offset"], out[3]["seq_id"]) == (5, 1)
    assert (out[4]["tok_offset"], out[4]["seq_id"]) == (0, 0)
    assert out[5]["n_tokens"] == 0 and out[5]["tok_offset"] == 1
    assert out[6]["tok_offset"] == 1  # zero-token doc shifts nothing


def test_total_tokens_conserved(spark):
    rows = [(i, "tok " * (i % 7), "s") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = sequence_pack(df, "doc_id", "text", "source", capacity=16).collect()
    last = max(out, key=lambda r: r["doc_id"])
    total = sum(r["n_tokens"] for r in out)
    assert last["tok_offset"] + last["n_tokens"] == total
