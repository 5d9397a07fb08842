"""Curation operators: decontamination, repetition, PII scrub."""

from __future__ import annotations

from chessmate_spark.operators.textan import (
    decontaminate,
    pii_scrub,
    repetition_score,
)


def test_decontaminate_flags_overlap_only(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),   # shares 4-shingle w/ eval 100
            (2, "zeta eta theta iota kappa"),        # no overlap
            (3, "x alpha beta gamma delta y"),       # shares the same shingle
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta unrelated tail")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate(train, eval_df, "doc_id", "text", 4).collect()
    }
    assert set(out) == {1, 3}
    assert out[1]["contaminated_by"] == 100
    assert out[1]["n_shared_shingles"] >= 1


def test_repetition_score_exact(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),  # 7 trigrams, 3 distinct -> 4/7 dup
            (2, "one two three four"),  # 2 trigrams, no dups
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_score(df, "doc_id", "text").collect()}
    assert out[1]["n_ngrams"] == 7
    assert abs(out[1]["dup_ngram_frac"] - 4 / 7) < 1e-6
    assert out[2]["dup_ngram_frac"] == 0.0


def test_pii_scrub_patterns(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@sub.example.org now"),
            (2, "call 555-1234-9876 ref 1234567 ok"),
            (3, "clean text only"),
            (4, None),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in pii_scrub(df, "doc_id", "text").collect()}
    assert out[1]["n_email"] == 1
    assert "<EMAIL>" in out[1]["scrubbed_text"]
    assert "jo.doe" not in out[1]["scrubbed_text"]
    assert out[2]["n_phone"] == 1 and out[2]["n_digits"] == 1
    assert "<PHONE>" in out[2]["scrubbed_text"]
    assert "<NUM>" in out[2]["scrubbed_text"]
    assert out[3]["n_email"] == out[3]["n_phone"] == out[3]["n_digits"] == 0
    assert out[3]["scrubbed_text"] == "clean text only"
    assert out[4]["scrubbed_text"] == ""


def test_vocabulary_counts_and_order(spark):
    from chessmate_spark.operators.textan import vocabulary

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "The dog and the cat"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    rows = [
        (r["token"], r["n_occurrences"], r["doc_freq"])
        for r in vocabulary(df, "doc_id", "text", top_n=3).collect()
    ]
    # 'the' 4x in 2 docs (case-folded); ties broken token-asc
    assert rows[0] == ("the", 4, 2)
    assert rows[1] == ("cat", 2, 2)
    assert rows[2][1] == 1  # every remaining token occurs once


def test_vocabulary_empty_corpus(spark):
    from chessmate_spark.operators.textan import vocabulary

    df = spark.createDataFrame([], "doc_id long, text string")
    assert vocabulary(df, "doc_id", "text").collect() == []


def test_prefix_join_equals_unfiltered_join(spark):
    """PPJoin prefix filtering is LOSSLESS: identical thresholded pairs
    to the all-shared-shingles join, across thresholds."""
    from chessmate_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for t in (0.1, 0.3, 0.6):
        a = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in ngram_jaccard_pairs(
                docs, "doc_id", "text", shingle_n=3, min_jaccard=t
            ).collect()
        }
        b = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in ngram_jaccard_pairs_prefix(
                docs, "doc_id", "text", shingle_n=3, min_jaccard=t
            ).collect()
        }
        assert a == b, f"t={t}: {len(a)} vs {len(b)}"


def test_bpe_merges_match_python_reference(spark):
    """Distributed BPE merge learning equals the classic per-word
    reference implementation (count-weighted, lexicographic ties)."""
    from collections import Counter

    from chessmate_spark.operators.textan import learn_bpe_merges

    texts = [
        "the cat sat on the mat",
        "the bat and the cat",
        "mat bat cat hat",
        "on and on and on",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = learn_bpe_merges(df, "doc_id", "text", n_merges=6)

    # pure-python reference
    words = [w for t in texts for w in t.split()]
    vocab = {w: list(w) for w in set(words)}
    freq = Counter(words)
    expect = []
    for _ in range(6):
        pc = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += freq[w]
        if not pc:
            break
        (a, b), c = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        expect.append((a, b, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    assert got == expect, (got, expect)


def test_bpe_driver_and_distributed_routes_identical(spark, monkeypatch):
    """Round-14: the size-gated driver merge loop must equal the
    distributed rounds merge-for-merge on a real corpus, for both the
    ascii and unicode tokenizers."""
    from chessmate_spark.operators import textan as tx

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(200)
    for tok in ("ascii", "unicode"):
        fast = tx.learn_bpe_merges(
            docs, "doc_id", "text", n_merges=5, tokenizer=tok
        )
        monkeypatch.setattr(tx, "_BPE_DRIVER_TYPES_LIMIT", 0)
        slow = tx.learn_bpe_merges(
            docs, "doc_id", "text", n_merges=5, tokenizer=tok
        )
        monkeypatch.undo()
        assert fast == slow and len(fast) == 5, (tok, fast, slow)
