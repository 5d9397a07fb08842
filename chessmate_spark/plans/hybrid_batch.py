"""Batch multi-question hybrid execution: N questions, ONE DataFrame
program with O(1) plan size (round-7 verdict #4).

``plans/hybrid.execute`` answers one question per Spark-job chain —
SERVE_BENCH's warm p50 is ~all fixed per-action overhead.  The batch
engine's answer to the reference's ~500 req/s serving rate is to
compile a QUESTION BATCH into one plan and amortize that overhead.

The key design decision is that per-question parameters are DATA, not
plan literals.  A first cut burned every plan's predicates/keywords
into per-question CASE chains; at N=64 the driver spent ~9 s just
CONSTRUCTING columns through Py4J (~140 ms/question — a second
sequential bottleneck wearing a batch costume).  Here the plans compile
to one broadcast metadata frame (question_id, filters as an array of
structs, rating bounds, keywords/phases/themes, limit/offset, query
vector) and every expression is built ONCE over those columns:

* summaries ⋈ qmeta on a generic filter predicate (forall over the
  filters array + NULL-aware rating bounds) tags each game row with
  every question it satisfies — a BroadcastNestedLoopJoin by
  construction, evaluating N predicates per row exactly like N
  sequential scans would, without N scans;
* per-question totals are one groupBy(question_id) count; pages one
  question-partitioned row_number window (the o4 window-top-k shape);
* the vector side scans position_vectors once against the same
  broadcast, scoring cosine(embedding, q_vec) built once;
* the scoring tail mirrors hybrid's ``_score_page`` expression-for-
  expression with plan literals replaced by qmeta columns; payload
  identity with the sequential scorer is pinned by test_serving.py
  over a filter/keyword/rating/empty-covering question set.

TWO Spark actions total — totals, final collect — versus four PER
QUESTION sequentially.  Reference anchor: chessmate_api.ml:586-724
generalized to a question batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scoring import (
    KEYWORD_WEIGHT,
    VECTOR_WEIGHT,
    clamp01,
)
from ..functions.text import tokenize_sources
from ..functions.vector import cosine_similarity
from ..operators.collapse import collapse_hits_by_game
from ..operators.relational import game_summaries
from ..query.intent import QueryPlan
from .hybrid import (
    VECTOR_OVERFETCH_MIN,
    VECTOR_OVERFETCH_MULTIPLIER,
    HybridTables,
    query_vector,
)


@dataclass
class BatchExecution:
    results: DataFrame  # question_id, _rank + hybrid result columns
    totals: Dict[int, int]
    # has_more/returned per question derive from the final collect and
    # live with the caller (batch_answer), not here — a pre-collect
    # dataclass cannot know how many rows each question returns
    warnings: List[str] = field(default_factory=list)


def _filter_rows(plan: QueryPlan) -> list:
    """plan.filters → (field_tag, value variants, lo, hi) structs with
    EVERY normalization the sequential path does in Python done here —
    ``v`` raw, ``vs`` = value.strip(), ``vl`` = value.strip().lower(),
    ``vn`` = value.lower() (no strip; _filter_matches' form) — so the
    generic expressions below are plain comparisons and cannot drift
    from str.strip()/str.lower() semantics (F.trim only strips ASCII
    spaces; Python strip() takes all whitespace).  Unknown fields keep
    their name and fall through every CASE to its ELSE."""
    rows = []
    for flt in plan.filters:
        f = flt.field.lower()
        lo = hi = None
        if f in ("eco", "eco_range"):
            norm = flt.value.strip().upper()
            parts = norm.split("-")
            if len(parts) == 2 and parts[0] and parts[1]:
                lo, hi = parts[0], parts[1]
            else:
                lo = hi = norm
        elif f == "vector_only":
            v = flt.value.strip().lower()
            if v in ("true", "1", "yes"):
                f = "vector_only_true"
            elif v in ("false", "0", "no"):
                f = "vector_only_false"
            # unparseable values keep the bare field name and are
            # IGNORED by every CASE below — compile_predicate's exact
            # behavior
        rows.append(
            (
                f, flt.value, flt.value.strip(),
                flt.value.strip().lower(), flt.value.lower(), lo, hi,
            )
        )
    return rows


_FILTER_STRUCT = (
    "array<struct<f:string,v:string,vs:string,vl:string,"
    "vn:string,lo:string,hi:string>>"
)


_QMETA_SCHEMA = (
    "question_id int, q_limit int, q_offset int,"
    " q_white_min int, q_black_min int, q_max_delta int,"
    " q_keywords array<string>, q_phases array<string>,"
    " q_themes array<string>,"
    f" q_filters {_FILTER_STRUCT},"
    " q_vec array<double>, q_k int"
)


def _qmeta(spark, plans: List[QueryPlan], dim: int) -> DataFrame:
    rows = []
    for i, p in enumerate(plans):
        rows.append(
            (
                i, p.limit, p.offset,
                p.rating.white_min, p.rating.black_min,
                p.rating.max_rating_delta,
                list(p.keywords), list(p.phases), list(p.themes),
                _filter_rows(p),
                [float(x) for x in query_vector(p, dim)],
                max(VECTOR_OVERFETCH_MULTIPLIER * p.limit,
                    VECTOR_OVERFETCH_MIN),
            )
        )
    return spark.createDataFrame(rows, _QMETA_SCHEMA)


def _lv(f) -> F.Column:
    # value.strip().lower(), precomputed driver-side in _filter_rows
    return f["vl"]


def _relational_match(f, has_vector_id: bool) -> F.Column:
    """ONE filter struct vs the summary row — compile_predicate's exact
    semantics (operators/relational.py) as a generic expression.

    The vector_only branches reference ``vector_id`` only when the
    summaries frame HAS that column: the generic CASE would otherwise
    fail analysis for every batch, where the sequential path only
    references the column when a plan actually carries the filter.  A
    vector_only filter against a frame without the column fails either
    way (sequential parity)."""
    field_ = f["f"]
    out = (
        F.when(
            field_.isin("opening", "opening_slug"),
            F.lower(F.col("opening_slug")) == _lv(f),
        )
        .when(field_ == "event", F.lower(F.col("event")) == _lv(f))
        .when(field_ == "result", F.col("result") == f["v"])
        .when(field_ == "white_player", F.lower(F.col("white")) == _lv(f))
        .when(field_ == "black_player", F.lower(F.col("black")) == _lv(f))
        .when(
            field_.isin("eco", "eco_range"),
            F.upper(F.col("eco_code")).between(f["lo"], f["hi"]),
        )
    )
    if has_vector_id:
        out = out.when(
            field_ == "vector_only_true", F.col("vector_id").isNotNull()
        ).when(field_ == "vector_only_false", F.col("vector_id").isNull())
    return out.otherwise(F.lit(True))  # unknown fields are ignored


def _rating_bounds(
    with_delta: bool,
    white_col: str = "white_rating",
    black_col: str = "black_rating",
    cols: "set | None" = None,
) -> F.Column:
    """NULL-aware qmeta rating bounds (rating_matches semantics when a
    bound is present; a NULL bound imposes nothing).  The vector side
    carries the ratings as white_elo/black_elo (payload_filter's
    columns) — pass those names there, plus ``cols`` so a clause is
    built only when its column exists (a plan that NEEDS a missing
    column is rejected upstream; when no plan does, the expression
    must not fail analysis for the whole batch)."""
    white, black = F.col(white_col), F.col(black_col)
    cond = F.lit(True)
    if cols is None or white_col in cols:
        cond = cond & (
            F.col("q_white_min").isNull()
            | (white.isNotNull() & (white >= F.col("q_white_min")))
        )
    if cols is None or black_col in cols:
        cond = cond & (
            F.col("q_black_min").isNull()
            | (black.isNotNull() & (black >= F.col("q_black_min")))
        )
    if with_delta:
        cond = cond & (
            F.col("q_max_delta").isNull()
            | (
                white.isNotNull()
                & black.isNotNull()
                & (F.abs(white - black) <= F.col("q_max_delta"))
            )
        )
    return cond


def _payload_match(f, cols: set) -> F.Column:
    """hybrid.payload_filter's vector-side semantics per filter struct.

    Branches reference a vectors-frame column only when it EXISTS
    (``cols``): the sequential payload_filter builds its expression
    per-plan and never touches a column no filter asks for, so the
    generic CASE must not fail analysis for the whole batch on an
    external vectors table lacking e.g. ``result``.  A plan whose
    filter NEEDS a missing column is handled in batch_execute (the
    whole vector stage degrades, mirroring the sequential per-question
    failure — see the docstring there for the mixed-batch caveat)."""
    field_ = f["f"]
    out = F.when(F.lit(False), F.lit(True))
    if "opening_slug" in cols:
        out = out.when(
            field_ == "opening", F.lower(F.col("opening_slug")) == _lv(f)
        )
    if "phases" in cols:
        out = out.when(
            field_ == "phase", F.array_contains(F.col("phases"), _lv(f))
        )
    if "themes" in cols:
        out = out.when(
            field_ == "theme", F.array_contains(F.col("themes"), _lv(f))
        )
    if "result" in cols:
        out = out.when(field_ == "result", F.col("result") == f["vs"])
    return out.otherwise(F.lit(True))


def _recheck_match(f) -> F.Column:
    """hybrid._filter_matches (P11 in-memory re-check) per filter struct:
    unknown fields count as matched."""
    field_ = f["f"]
    return (
        F.when(
            field_ == "opening",
            F.coalesce(F.col("opening_slug"), F.lit("unknown_opening"))
            == f["vn"],  # _filter_matches lowers WITHOUT stripping
        )
        .when(
            field_ == "result",
            F.coalesce(F.col("result"), F.lit("*")) == f["v"],
        )
        .when(
            # _filter_matches handles eco_range ONLY; a bare 'eco'
            # filter counts as matched (unknown-field semantics)
            field_ == "eco_range",
            F.col("eco_code").isNotNull()
            & F.upper(F.col("eco_code")).between(f["lo"], f["hi"]),
        )
        .otherwise(F.lit(True))
    )


_PAYLOAD_NEEDS = {
    "opening": "opening_slug",
    "phase": "phases",
    "theme": "themes",
    "result": "result",
}


def _batch_vector_hits(
    vectors: DataFrame, qmeta: DataFrame, plans: List[QueryPlan]
) -> DataFrame:
    """All questions' filtered cosine top-k in one scan: join the
    vector rows against the broadcast question metadata on the payload
    filter, score cosine(embedding, q_vec) (built once), per-question
    over-fetch top-k (window — scores/ids only), collapse per
    (question, game).

    Column availability mirrors the sequential path: expressions
    reference only columns the vectors frame HAS; a plan whose filter
    or rating bound NEEDS a missing column raises here — caught by
    batch_execute's degradation net, exactly where the sequential
    path's per-question vector_hits would fail.  (Mixed-batch caveat:
    sequentially only the NEEDING question degrades to fallback
    scoring; in a batch the whole vector stage does — the trade is
    documented, and a frame with the standard columns never hits it.)"""
    cols = set(vectors.columns)
    for p in plans:
        for flt in p.filters:
            needed = _PAYLOAD_NEEDS.get(flt.field.lower())
            if needed and needed not in cols:
                raise ValueError(
                    f"vectors frame lacks column {needed!r} needed by a"
                    f" {flt.field!r} filter"
                )
        if p.rating.white_min is not None and "white_elo" not in cols:
            raise ValueError(
                "vectors frame lacks white_elo needed by a rating bound"
            )
        if p.rating.black_min is not None and "black_elo" not in cols:
            raise ValueError(
                "vectors frame lacks black_elo needed by a rating bound"
            )
    pred = F.forall(
        F.col("q_filters"), lambda f: _payload_match(f, cols)
    ) & _rating_bounds(
        with_delta=False, white_col="white_elo", black_col="black_elo",
        cols=cols,
    )
    q = qmeta.select(
        "question_id", "q_filters", "q_white_min", "q_black_min",
        "q_max_delta", "q_vec", "q_k",
    )
    tagged = (
        vectors.join(F.broadcast(q), pred)
        .withColumn(
            "score",
            cosine_similarity(F.col("embedding"), F.col("q_vec")),
        )
        .select(
            "question_id", "score", "q_k",
            "vector_id", "game_id", "phases", "themes", "keywords",
        )
    )
    w = Window.partitionBy("question_id").orderBy(
        F.col("score").desc(), F.col("vector_id").asc()
    )
    top = (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("q_k"))
        .drop("_rn", "vector_id", "q_k")
    )
    return collapse_hits_by_game(top, extra_keys=("question_id",))


def batch_execute(
    tables: HybridTables,
    plans: List[QueryPlan],
    dim: int = 16,
) -> BatchExecution:
    """Execute every plan in one shared program; per-question rows come
    back under ``question_id`` with ``_rank`` preserving each
    question's result order."""
    if not plans:
        raise ValueError("batch_execute needs at least one plan")
    spark = tables.games.sparkSession
    qmeta = _qmeta(spark, plans, dim)
    summaries = game_summaries(tables.games, tables.players)
    has_vid = "vector_id" in summaries.columns
    if not has_vid and any(
        flt.field.lower() == "vector_only"
        and flt.value.strip().lower()
        in ("true", "1", "yes", "false", "0", "no")
        for p in plans
        for flt in p.filters
    ):
        # only a PARSEABLE vector_only value makes compile_predicate
        # reference the column (an unparseable one is ignored there,
        # so it must be ignored here too — payload identity)
        raise ValueError(
            "a plan carries a vector_only filter but the games frame has"
            " no vector_id column (the sequential path fails here too)"
        )
    rel_pred = F.forall(
        F.col("q_filters"), lambda f: _relational_match(f, has_vid)
    ) & _rating_bounds(with_delta=True)
    tagged = summaries.join(F.broadcast(qmeta), rel_pred)

    # per-question page: row_number window in the serving sort order,
    # then each question keeps rows (offset, offset+limit]
    w = Window.partitionBy("question_id").orderBy(
        F.col("played_on").desc_nulls_last(), F.col("id").desc()
    )
    page = (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(
            (F.col("_rn") > F.col("q_offset"))
            & (F.col("_rn") <= F.col("q_offset") + F.col("q_limit"))
        )
        .drop("_rn")
    )

    warnings: List[str] = []
    hits = None
    if tables.position_vectors is not None:
        try:
            hits = _batch_vector_hits(tables.position_vectors, qmeta, plans)
        except Exception as exc:  # V7 graceful degradation, batch-wide
            warnings.append(f"Vector search unavailable ({exc})")
            hits = None
    else:
        warnings.append(
            "Query embeddings fallback (no position_vectors table)"
        )

    if hits is not None:
        page = page.join(
            F.broadcast(
                hits.select(
                    F.col("question_id").alias("_hit_q"),
                    F.col("game_id").alias("_hit_game"),
                    F.col("score").alias("_hit_score"),
                    F.col("phases").alias("_hit_phases"),
                    F.col("themes").alias("_hit_themes"),
                    F.col("keywords").alias("_hit_keywords"),
                )
            ),
            (page["question_id"] == F.col("_hit_q"))
            & (page["id"] == F.col("_hit_game")),
            "left",
        ).drop("_hit_q", "_hit_game")
    else:
        page = (
            page.withColumn("_hit_score", F.lit(None).cast("double"))
            .withColumn("_hit_phases", F.lit(None).cast("array<string>"))
            .withColumn("_hit_themes", F.lit(None).cast("array<string>"))
            .withColumn("_hit_keywords", F.lit(None).cast("array<string>"))
        )

    # ACTION 1: per-question totals in one aggregate
    counts = {
        r["question_id"]: r["cnt"]
        for r in tagged.groupBy("question_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    totals = {i: int(counts.get(i, 0)) for i in range(len(plans))}

    scored = _score_page_batch(page)
    return BatchExecution(
        results=scored,
        totals=totals,
        warnings=warnings,
    )


def _score_page_batch(page: DataFrame) -> DataFrame:
    """hybrid._score_page's expressions with every plan literal replaced
    by its qmeta column — ONE frame, ONE final window, expressions
    built once regardless of N.  Kept in lockstep with _score_page by
    the payload-identity tests (test_serving.py): any divergence
    between the two scorers fails batch==sequential."""
    rating_ok = _rating_bounds(with_delta=True)
    summary_tokens = tokenize_sources(
        F.col("white"), F.col("black"), F.col("event"),
        F.col("opening_name"), F.col("opening_slug"),
    )
    merged_tokens = F.when(
        F.col("_hit_keywords").isNotNull(),
        F.array_sort(
            F.array_distinct(
                F.transform(
                    F.concat(summary_tokens, F.col("_hit_keywords")), F.lower
                )
            )
        ),
    ).otherwise(summary_tokens)

    n_filters = F.size(F.col("q_filters"))
    matched = F.size(F.filter(F.col("q_filters"), _recheck_match))
    fallback = F.when(n_filters == 0, F.lit(0.6)).otherwise(
        F.lit(0.4)
        + F.lit(0.6) * matched.cast("double") / n_filters.cast("double")
    )
    fallback = F.when(~rating_ok, F.lit(0.0)).otherwise(fallback)
    vector_score = F.when(
        F.col("_hit_score").isNotNull(),
        F.when(~rating_ok, F.lit(0.0)).otherwise(
            clamp01(F.col("_hit_score"))
        ),
    ).otherwise(fallback)
    vector_score = F.least(F.lit(1.0), vector_score)
    # A4 over the qmeta keyword column (keyword_overlap's formula)
    kw_score = F.when(F.size(F.col("q_keywords")) == 0, F.lit(0.0)).otherwise(
        F.size(F.array_intersect(F.col("q_keywords"), merged_tokens)).cast(
            "double"
        )
        / F.greatest(F.lit(1), F.size(F.col("q_keywords"))).cast("double")
    )
    total_score = (
        F.lit(VECTOR_WEIGHT) * vector_score + F.lit(KEYWORD_WEIGHT) * kw_score
    )

    merge_arr = lambda base, extra: F.when(  # noqa: E731
        extra.isNotNull() & (F.size(extra) > 0),
        F.array_sort(
            F.array_distinct(F.transform(F.concat(base, extra), F.lower))
        ),
    ).otherwise(base)

    w = Window.partitionBy("question_id").orderBy(
        F.col("total_score").desc(), F.col("id").desc()
    )
    return (
        page.withColumn("total_score", total_score)
        .withColumn("vector_score", vector_score)
        .withColumn("keyword_score", kw_score)
        .withColumn(
            "phases", merge_arr(F.col("q_phases"), F.col("_hit_phases"))
        )
        .withColumn(
            "themes", merge_arr(F.col("q_themes"), F.col("_hit_themes"))
        )
        # combined_keywords: the PLAN's keywords merge into the payload
        .withColumn(
            "keywords",
            F.array_sort(
                F.array_distinct(
                    F.concat(
                        F.transform(F.col("q_keywords"), F.lower),
                        merged_tokens,
                    )
                )
            ),
        )
        .drop("_hit_score", "_hit_phases", "_hit_themes", "_hit_keywords")
        .withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= F.col("q_limit"))
        .drop(
            "q_limit", "q_offset", "q_white_min", "q_black_min",
            "q_max_delta", "q_keywords", "q_phases", "q_themes",
            "q_filters", "q_vec", "q_k",
        )
    )
