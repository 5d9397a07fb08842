"""Batch multi-query BM25 retrieval over posting lists.

The t25 entry's core (plans/queries.py) extracted and generalized
(round-7 verdict #5): the query set is an ARBITRARY (query_id, term)
DataFrame, not just the corpus-derived vocabulary buckets, and the
postings ⋈ query-terms join can route either through a broadcast (the
default — query-term tables are tiny next to any corpus) or, once the
term table outgrows the broadcast threshold, through the d16-style
Bloom split: posting rows whose term the bitmap proves absent from the
query set drop BEFORE the exchange, so the exact shuffle join is
suspect-sized, never corpus-sized.

Reference anchor: the hybrid executor's keyword scoring path
(hybrid_executor.ml:127-133) generalized beyond one request's keyword
set.  Weighting: Robertson BM25 with Lucene's non-negative idf;
per-term contributions round to integer MICRO-units before the
per-(query, doc) sum so the aggregation is exact int64 arithmetic —
immune to accumulation order in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize_expr
from .topk import topk_per_group

BM25_K1 = 1.2
BM25_B = 0.75

# route="auto" switch point, from the committed route_crossover
# measurement (4 GiB worker): broadcast won through 4M df-carrying
# distinct terms, bloom won at 16M (20.3 s vs 50.7 s) and was the only
# survivor at 48M (broadcast OOMed) — the geometric middle of the
# bracketing points is the default switch, overridable per call for
# differently-sized executors.
AUTO_BLOOM_TERMS = 8_000_000


def batch_bm25_retrieval(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    doc_id: str = "doc_id",
    text_col: str = "text",
    query_id: str = "query_id",
    term_col: str = "term",
    k1: float = BM25_K1,
    b: float = BM25_B,
    route: str = "auto",
    m_bits: int = 1 << 20,
    n_hashes: int = 5,
    persist_queries: bool = False,
    auto_bloom_terms: int = AUTO_BLOOM_TERMS,
) -> DataFrame:
    """Top-``k`` documents per query: ``(query_id, rank, doc_id,
    score_micro)``.

    ``queries`` is any (query_id, term) frame — duplicate (query, term)
    rows are deduplicated (a term contributes once per query, the
    standard bag-of-terms retrieval contract).  Document frequency is
    attached FROM the corpus, so queries carry no corpus statistics —
    unless the frame already HAS a ``df`` column, which is trusted
    as-is (the t25 entry derives its query set from the corpus
    vocabulary, so df comes for free and the plan stays join-free on
    the query side).  In the bloom route df is computed from the
    SUSPECT postings (exact for every term that passes the bitmap,
    and every true query term does — no false negatives), so no
    vocabulary-scale table ever shuffles.

    ``route``:
      * ``"broadcast"`` — the query-term table ships to every executor;
        posting lists never reshuffle for the retrieval join.  The
        right plan while (distinct terms x ~40 B) fits the broadcast
        budget.  NOTE: without a pre-attached ``df`` column this route
        inner-joins the terms against the corpus df table BEFORE the
        explicit broadcast, which sheds every term absent from the
        corpus — so a miss-dominated frame never outgrows memory on
        this path; only a ``df``-carrying frame (the t25 shape) ships
        in full.
      * ``"bloom"`` — the 100 TB fallback once a df-carrying term
        table outgrows a broadcast (e.g. millions of mined
        hard-negative queries): ONE m_bits/8-byte bitmap of the query
        terms ships instead; posting rows whose term is provably
        absent drop at the scan, and only the suspect sliver pays the
        exact shuffle join on term.  No false negatives ⇒ identical
        output (the bloom_prune_join contract).  Measured crossover
        (SCALE_SMOKE ``route_crossover``, 4 GiB worker): broadcast
        wins through ~4M terms, bloom wins at 16M (20.3 s vs 50.7 s),
        and at 48M broadcast dies with Spark's not-enough-memory-to-
        broadcast while bloom completes — switch once the distinct
        df-carrying term table approaches the per-executor broadcast
        budget.
      * ``"auto"`` (default, round 11) — count the deduplicated query
        terms (ONE cheap aggregate over the query frame — the side the
        route decision is about) and take bloom from
        ``auto_bloom_terms`` (default 8M, the geometric middle of the
        measured 4M-broadcast-wins / 16M-bloom-wins bracket), broadcast
        below.  Both routes are output-identical (the bloom contract),
        so auto never changes results, only the plan; the chosen route
        is exposed on the result as ``._auto_route`` and the explicit
        routes remain as overrides.

    Scale shape (both routes): ONE posexplode scan builds
    (term, doc, tf, doc_len) postings with map-side combine — doc
    length rides the grouping key, so no doc-keyed join exists; the
    (query, doc) score aggregate is the single corpus-scale exchange;
    per-query top-k is window-top-k.  At 100 TB the postings come from
    the materialized inverted index (t23) instead of a rescan.

    In the bloom route ``queries`` must be DETERMINISTIC (the
    bloom_prune_anti_join contract): it is evaluated once into the
    bitmap and again in the exact join, and a nondeterministic source
    (sample(), unordered limit()) could hand the bitmap a DIFFERENT
    term set — a bloom false NEGATIVE, silently zeroing those terms'
    scores.  For such inputs pass ``persist_queries=True``, which pins
    one materialization of the deduplicated (query, term) projection;
    the pinned frame rides the returned DataFrame — release with
    ``bloom.release_pinned(result, "_retrieval_pinned_queries")``
    after materializing."""
    if route not in ("auto", "broadcast", "bloom"):
        raise ValueError(
            f"route must be 'auto', 'broadcast' or 'bloom', got {route!r}"
        )
    text = F.trim(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    arr = tokenize_expr(text)
    base = docs.select(
        F.col(doc_id).alias("doc_id"),
        arr.alias("toks"),
        F.size(arr).cast("bigint").alias("n_tokens"),
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    postings = (
        base.select("doc_id", "n_tokens", F.explode("toks").alias("term"))
        .groupBy("term", "doc_id", "n_tokens")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    has_df = "df" in queries.columns
    q_cols = [
        F.col(query_id).alias("query_id"),
        F.col(term_col).alias("_q_term"),
    ] + ([F.col("df")] if has_df else [])
    qterms = queries.select(*q_cols).dropDuplicates(["query_id", "_q_term"])
    pinned = None
    if persist_queries:
        qterms = qterms.persist()
        # Capture the persisted object NOW: the has_df=False branches
        # below rebind `qterms` to a derived join, and attaching that
        # would make release_pinned unpersist a never-persisted frame
        # (a no-op) while the cached projection leaks for the session.
        pinned = qterms
    if route == "auto":
        # the deduplicated term count IS the broadcast-size observable;
        # with persist_queries the count doubles as the pinning
        # materialization the bloom contract wants anyway
        route = (
            "bloom" if qterms.count() >= auto_bloom_terms else "broadcast"
        )

    def df_from_docs():
        # df = docs containing the term, from a per-doc distinct-token
        # explode of the RAW docs — deliberately NOT derived from
        # `postings`: that subtree (full-token explode + two-level agg)
        # is the plan's dominant cost, and referencing it here would
        # evaluate it twice (once to build the broadcast/join side,
        # once in the retrieval join).  Identical values either way.
        return (
            docs.select(F.explode(F.array_distinct(arr)).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        )

    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("n_tokens") / F.col("avgdl"))
    micro = F.floor(
        (idf * (F.col("tf") * (k1 + 1.0)) / denom) * 1e6 + 0.5
    ).cast("bigint")

    if route == "broadcast":
        if not has_df:
            # vocabulary-scale join, broadcast into the query side —
            # df then rides the broadcast exactly like a pre-attached df
            df_tbl = df_from_docs()
            qterms = qterms.join(
                df_tbl, qterms["_q_term"] == df_tbl["term"], "inner"
            ).select("query_id", "_q_term", "df")
        joined = postings.join(
            F.broadcast(qterms), postings["term"] == qterms["_q_term"]
        )
    else:
        from .bloom import bloom_build, bloom_might_contain

        bitmap = bloom_build(qterms, "_q_term", m_bits=m_bits, k=n_hashes)
        suspects = postings.where(
            bloom_might_contain(F.col("term"), bitmap, m_bits, k=n_hashes)
        )
        if not has_df:
            # df from the bloom-pruned distinct-token stream: a term
            # passing the bitmap keeps ALL its per-doc rows (the bloom
            # keys on term), so its pruned doc count IS its exact
            # corpus df; terms failing the bitmap match no query term
            # and need none.  Derived from the RAW docs, not from
            # `suspects` — referencing the postings subtree here would
            # evaluate its heavy two-level aggregation twice.  The
            # filter sheds rows BEFORE the agg's exchange, so the full
            # vocabulary never shuffles.
            sdf = (
                docs.select(
                    F.explode(F.array_distinct(arr)).alias("_df_term")
                )
                .where(
                    bloom_might_contain(
                        F.col("_df_term"), bitmap, m_bits, k=n_hashes
                    )
                )
                .groupBy("_df_term")
                .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
            )
            qterms = qterms.join(
                sdf, qterms["_q_term"] == sdf["_df_term"], "inner"
            ).select("query_id", "_q_term", "df")
        joined = suspects.join(
            qterms, suspects["term"] == qterms["_q_term"]
        )
    scored = (
        joined.crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(micro).cast("bigint").alias("score_micro"))
    )
    out = (
        topk_per_group(
            scored,
            ["query_id"],
            [F.desc("score_micro"), F.asc("doc_id")],
            k,
        )
        .select("query_id", "rank", "doc_id", "score_micro")
        .orderBy("query_id", "rank")
    )
    if persist_queries:
        out._retrieval_pinned_queries = pinned
    out._auto_route = route
    return out
