"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.  All JVM-side expressions over the documents table —
no Python in the hot path.

These generalize the reference's text functions (F1/F2/F12/F13) into the
operators a training-data pipeline needs (SURVEY §7.2 step 10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_expr, minhash_expr
from ..functions.scoring import portable_round
from ..functions.text import norm_tokens_expr, tokenize_expr

# Tiny deterministic stopword lists per language (n-gram heuristic seeds).
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "que", "de", "en", "es", "una", "por", "con"],
}

# BPE-ish token regex: words, numbers, or single non-space symbols.
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def _ws_tokens(text: Column) -> Column:
    return tokenize_expr(F.trim(text))


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count + char count."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    return df.select(
        F.col(id_col),
        F.size(_ws_tokens(text)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)).alias(
            "bpe_tokens"
        ),
        F.length(text).alias("n_chars"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic document quality: length band + punctuation ratio + stopword
    ratio + mean word length, composited to [0,1]."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    tokens = _ws_tokens(F.lower(text))
    n_tokens = F.greatest(F.size(tokens), F.lit(1)).cast("double")
    n_chars = F.greatest(F.length(text), F.lit(1)).cast("double")
    stopwords = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    stop_hits = F.size(
        F.filter(tokens, lambda t: F.array_contains(stopwords, t))
    ).cast("double")
    punct_chars = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", "")).cast("double")
    mean_word_len = n_chars / n_tokens
    length_score = F.least(F.size(tokens).cast("double") / F.lit(100.0), F.lit(1.0))
    stop_score = F.least(stop_hits / n_tokens * F.lit(4.0), F.lit(1.0))
    punct_penalty = F.least(punct_chars / n_chars * F.lit(4.0), F.lit(1.0))
    word_len_score = F.when(
        (mean_word_len >= 3.0) & (mean_word_len <= 10.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    quality = (
        F.lit(0.4) * length_score
        + F.lit(0.3) * stop_score
        + F.lit(0.2) * word_len_score
        + F.lit(0.1) * (F.lit(1.0) - punct_penalty)
    )
    return df.select(
        F.col(id_col),
        portable_round(length_score, 6).alias("length_score"),
        portable_round(stop_score, 6).alias("stopword_score"),
        portable_round(punct_penalty, 6).alias("punct_ratio_penalty"),
        portable_round(quality, 6).alias("quality"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-overlap language ID: argmax marker-hit ratio, 'und' if zero."""
    tokens = _ws_tokens(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    n_tokens = F.greatest(F.size(tokens), F.lit(1)).cast("double")
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        marker_arr = F.array(*[F.lit(w) for w in markers])
        hits = F.size(F.filter(tokens, lambda t: F.array_contains(marker_arr, t)))
        scores.append(F.struct((hits.cast("double") / n_tokens).alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return df.select(
        F.col(id_col),
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias("detected_lang"),
        portable_round(best["score"], 6).alias("lang_score"),
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 4,
) -> DataFrame:
    """Eval-set decontamination (the n-gram overlap check LLM training
    corpora run against their benchmarks): flag every training doc that
    shares at least one distinct ``shingle_n``-token shingle with any
    eval doc.  Returns (id, n_shared_shingles, contaminated_by=min eval
    id).

    The eval side explodes to (shingle, eval_id) and BROADCASTS — eval
    sets are thousands of rows against a corpus of billions, so the
    training side never shuffles; flagging is a broadcast-hash semi
    lookup plus one aggregation on the (small) flagged subset.
    """
    from ..functions.hashing import word_shingles_expr

    def shingles(df):
        toks = norm_tokens_expr(
            F.coalesce(F.col(text_col), F.lit(""))
        )
        return df.select(
            F.col(id_col),
            F.explode(word_shingles_expr(toks, shingle_n)).alias("_s"),
        )

    ev = (
        shingles(eval_df)
        .select(F.col(id_col).alias("_eval_id"), "_s")
        .distinct()
    )
    tr = shingles(train)
    return (
        tr.join(F.broadcast(ev), "_s")
        .groupBy(id_col)
        .agg(
            F.countDistinct("_s").alias("n_shared_shingles"),
            F.min("_eval_id").alias("contaminated_by"),
        )
    )


def repetition_score(
    df: DataFrame, id_col: str, text_col: str, ngram: int = 3
) -> DataFrame:
    """Within-document repetition (Gopher-style quality signal): fraction
    of ``ngram``-token occurrences that are repeats of an earlier one.
    Expression-only — the shingle list here is intentionally NOT
    deduplicated, the duplicates are the signal."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = norm_tokens_expr(text)
    count = F.greatest(F.size(toks) - F.lit(ngram - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(" ", F.slice(toks, i, ngram)),
    )
    n = F.size(grams).cast("double")
    dup_frac = (n - F.size(F.array_distinct(grams)).cast("double")) / n
    return df.select(
        F.col(id_col),
        F.size(grams).alias("n_ngrams"),
        portable_round(dup_frac, 6).alias("dup_ngram_frac"),
    )


PII_PATTERNS = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("phone", r"[0-9]{3}-[0-9]{4}-[0-9]{4}", "<PHONE>"),
    ("digits", r"[0-9]{6,}", "<NUM>"),
]


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII-style pattern redaction: emails, phone shapes, long digit runs
    replaced with typed placeholder tokens; per-pattern match counts kept
    for audit.  Pure regexp_replace/regexp-count expressions — the
    patterns deliberately use portable regex syntax (no lookarounds) so
    one definition drives Spark, DuckDB, and any downstream RE2 engine.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    counts = [
        F.size(F.regexp_extract_all(text, F.lit(pat), 0)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    scrubbed = text
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.select(F.col(id_col), *counts, scrubbed.alias("scrubbed_text"))


def sequence_pack(
    df: DataFrame,
    id_col: str,
    text_col: str,
    part_col: str,
    capacity: int = 2048,
) -> DataFrame:
    """Concatenate-and-chunk sequence packing (the GPT-style pretraining
    layout): documents are concatenated per ``part_col`` shard in
    ``id_col`` order and split into fixed ``capacity``-token training
    sequences.  Each doc reports its token offset within the shard and the
    sequence it starts in: ``seq_id = floor(offset / capacity)``.

    One window (prefix sum) per shard — a single shuffle on ``part_col``;
    shards are the parallelism unit, exactly how a 100 TB corpus would
    pack per input file/source.
    """
    from pyspark.sql.window import Window

    text = F.coalesce(F.col(text_col), F.lit(""))
    n_tokens = F.size(
        F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)
    ).cast("bigint")
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = df.select(
        F.col(id_col), F.col(part_col), n_tokens.alias("n_tokens")
    )
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    return base.select(
        id_col,
        part_col,
        "n_tokens",
        offset.alias("tok_offset"),
        F.floor(offset / capacity).cast("bigint").alias("seq_id"),
    )


def document_fingerprint(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 4
) -> DataFrame:
    """Rolling-hash-style fingerprint: minhash over character 8-grams, hex.

    Robust to small edits (winnowing-style), cheap equality key for
    clustering shards of near-identical documents.
    """
    text = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    n = F.greatest(F.length(text) - F.lit(7), F.lit(1))
    grams = F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(text, i, 8))
    )
    sig = minhash_expr(grams, num_hashes)
    return df.select(
        F.col(id_col),
        md5_expr(F.concat_ws(",", F.transform(sig, lambda x: x.cast("string")))).alias(
            "fingerprint"
        ),
    )


def _corpus_tokens(text_col: str, tokenizer: str):
    """Tokenizer routing for the corpus operators: "whitespace" (the
    vocabulary default — lowered text split on whitespace), "ascii"
    (norm_tokens_expr, byte-ASCII reference parity), or "unicode"
    (unicode_norm_tokens_expr, \\p{L}\\p{N} classes — the opt-in for
    non-Latin corpora)."""
    from ..functions.text import unicode_norm_tokens_expr

    col = F.col(text_col)
    if tokenizer == "whitespace":
        return tokenize_expr(F.trim(F.lower(F.coalesce(col, F.lit("")))))
    if tokenizer == "ascii":
        return norm_tokens_expr(col)
    if tokenizer == "unicode":
        return unicode_norm_tokens_expr(col)
    raise ValueError(f"unknown tokenizer {tokenizer!r}")


def vocabulary(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 50,
    tokenizer: str = "whitespace",
) -> DataFrame:
    """Corpus vocabulary extraction: top-N lower-cased tokens with total
    occurrences and document frequency — the counting pass a
    tokenizer/vocab build (BPE seeding, stopword induction) starts from.
    ``tokenizer="unicode"`` opts into the UTF-8-safe token classes for
    non-Latin corpora (_corpus_tokens).

    Shape: explode → two partial+final aggregations ((token, doc) then
    token) → TakeOrderedAndProject.  Both shuffles move (token, count)
    pairs with map-side combine, so the exchanged volume is bounded by
    distinct tokens per partition, not corpus size.  Deterministic total
    order (count desc, token asc) makes the top-N oracle-stable."""
    toks = df.select(
        F.col(id_col),
        F.explode(_corpus_tokens(text_col, tokenizer)).alias("token"),
    )
    per_doc = toks.groupBy("token", id_col).agg(
        F.count(F.lit(1)).alias("tf")
    )
    return (
        per_doc.groupBy("token")
        .agg(
            F.sum("tf").cast("bigint").alias("n_occurrences"),
            F.count(F.lit(1)).cast("bigint").alias("doc_freq"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(top_n)
    )


# Word-TYPE gate for the driver BPE route: 1M types x ~30 bytes is tens
# of MB of driver memory — the footprint reference BPE trainers assume.
_BPE_DRIVER_TYPES_LIMIT = 1_000_000


def _bpe_merges_driver(types, n_merges: int) -> "list[tuple[str, str, int]]":
    """The merge loop over a COLLECTED (word, freq) type table — exact
    integer pair counts, (cnt desc, l asc, r asc) argmax, left-to-right
    non-overlapping pair merge: the same semantics as the distributed
    rounds (dual-route test + the pure-Python reference pin)."""
    vocab = [(list(r["word"]), int(r["freq"])) for r in types]
    merges: list = []
    for _ in range(n_merges):
        counts: dict = {}
        for syms, freq in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        (l, r), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((l, r, cnt))
        merged = l + r
        for k, (syms, freq) in enumerate(vocab):
            if len(syms) < 2:
                continue
            out = []
            i = 0
            n = len(syms)
            changed = False
            while i < n:
                if i + 1 < n and syms[i] == l and syms[i + 1] == r:
                    out.append(merged)
                    i += 2
                    changed = True
                else:
                    out.append(syms[i])
                    i += 1
            if changed:
                vocab[k] = (out, freq)
    return merges


def learn_bpe_merges(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_merges: int = 8,
    tokenizer: str = "ascii",
) -> "list[tuple[str, str, int]]":
    """Distributed BPE merge learning (Sennrich et al. 2016, the
    byte-pair-encoding tokenizer-training loop): returns the first
    ``n_merges`` merge rules as (left, right, weighted_count), ties
    broken lexicographically so the result is fully deterministic.

    The distributed-BPE shape: ONE corpus pass collapses text to the
    word-frequency table (types, not occurrences — the only
    corpus-scale shuffle), and every merge round then runs on that
    types-sized table: adjacent-pair counts are a partial+final
    aggregate, the argmax is a 1-row TakeOrdered collect (a scalar per
    round, d8's fingerprint discipline), and the merge applies as ONE
    literal string replace over the marker-wrapped symbol string —
    ``<a><b>`` → ``<ab>`` is exactly BPE's left-to-right non-overlapping
    pair merge (pinned against a pure-Python reference in tests).
    Lineage is truncated per round.
    """
    words = (
        df.select(F.explode(_corpus_tokens(text_col, tokenizer)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # Small-types route (round 14, the union-find/pagerank gate pattern):
    # after the one corpus-scale aggregate the loop runs on the WORD-TYPE
    # table, which is what reference BPE trainers hold in memory outright
    # — when the measured type count fits the gate, the merge rounds run
    # as driver dict arithmetic (exact integer counts, the same
    # (cnt desc, l asc, r asc) tie-break: UTF-8 byte order and Python
    # code-point order agree) instead of n_merges aggregate+collect
    # Spark jobs (~2 jobs + ~0.15 s driver planning per round).  Past
    # the gate the distributed rounds below run unchanged — types grow
    # with vocabulary, not corpus bytes, so even the 100 TB posture
    # rarely exceeds it, but the fallback keeps the bound honest.
    types = words.limit(_BPE_DRIVER_TYPES_LIMIT + 1).collect()
    if len(types) <= _BPE_DRIVER_TYPES_LIMIT:
        return _bpe_merges_driver(types, n_merges)
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.concat(F.lit("<"), F.col("word").substr(i, F.lit(1)), F.lit(">")),
    )
    vocab = words.select(
        "freq", F.concat_ws("", chars).alias("repr")
    ).localCheckpoint(eager=False)

    merges: list = []
    for _ in range(n_merges):
        syms = F.split(
            F.expr("substring(repr, 2, length(repr) - 2)"), "><"
        )
        n = F.size(syms)
        pairs = (
            vocab.filter(n >= 2)
            .select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice(syms, 1, n - 1).alias("l"),
                        F.slice(syms, 2, n - 1).alias("r"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        l, r, cnt = pairs[0]["l"], pairs[0]["r"], int(pairs[0]["cnt"])
        merges.append((l, r, cnt))
        vocab = vocab.select(
            "freq",
            F.replace(
                F.col("repr"),
                F.lit(f"<{l}><{r}>"),
                F.lit(f"<{l}{r}>"),
            ).alias("repr"),
        ).localCheckpoint(eager=False)
    return merges
