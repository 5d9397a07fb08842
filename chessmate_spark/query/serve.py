"""Serving shim: the reference's ``/query`` route as one driver function.

``answer_question`` is the single entry point a reference user would hit —
it composes intent analysis (query_intent), hybrid execution
(plans/hybrid), and the response-document contract into one call,
mirroring the reference route end to end:

  * request validation — chessmate_api.ml:586-668 (``normalize_question``,
    ``validate_limit``/``validate_offset``, identical error strings);
  * plan echo — chessmate_api.ml:386-414 ``plan_to_json``;
  * per-result document — chessmate_api.ml:77-115 ``Result.to_json``
    (field order, null policy, synopsis/year/opening fallbacks at :20-51);
  * response payload — chessmate_api.ml:789-806 (question/plan/summary/
    results/offset/limit/total/has_more/agent_status + warnings);
  * five-line summary — lib/query/result_formatter.ml:8-16;
  * CLI text rendering — lib/query/search_command.ml ``parse_success``
    (driven by ``python -m chessmate_spark.query``, bin/main.ml:273).

Everything data-side stays a Spark plan (hybrid.execute); the only
driver materialization is the final page collect — ≤ ``limit`` rows,
exactly what an HTTP response would serialize anyway.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Dict, List, Optional

from pyspark.sql import SparkSession

from ..functions.guards import sanitize_py
from .intent import MAX_LIMIT, QueryPlan, Request, analyse

if TYPE_CHECKING:  # runtime import is lazy: plans.hybrid imports this pkg
    from ..plans.hybrid import HybridTables

AGENT_STATUS_DISABLED = "disabled"

SUMMARY_EMPTY = "No games matched the requested filters."


class ServingError(ValueError):
    """Invalid request — the message is the reference's 400-body text."""


def _validate_question(question: str) -> str:
    trimmed = (question or "").strip()
    if not trimmed:
        raise ServingError("question parameter missing")
    return trimmed


def _validate_limit(limit: Optional[int]) -> Optional[int]:
    if limit is None:
        return None
    if not isinstance(limit, int) or isinstance(limit, bool):
        raise ServingError("limit must be an integer")
    if limit < 1:
        raise ServingError("limit must be >= 1")
    if limit > MAX_LIMIT:
        raise ServingError(f"limit must be <= {MAX_LIMIT}")
    return limit


def _validate_offset(offset: Optional[int]) -> Optional[int]:
    if offset is None:
        return None
    if not isinstance(offset, int) or isinstance(offset, bool):
        raise ServingError("offset must be an integer")
    if offset < 0:
        raise ServingError("offset must be >= 0")
    return offset


def plan_to_dict(plan: QueryPlan) -> Dict[str, Any]:
    """chessmate_api.ml:386-414 ``plan_to_json``."""
    return {
        "cleaned_text": plan.cleaned_text,
        "limit": plan.limit,
        "offset": plan.offset,
        "filters": [
            {"field": f.field, "value": f.value} for f in plan.filters
        ],
        "keywords": list(plan.keywords),
        "rating": {
            "white_min": plan.rating.white_min,
            "black_min": plan.rating.black_min,
            "max_rating_delta": plan.rating.max_rating_delta,
        },
    }


def _opening_name(name: Optional[str], slug: Optional[str]) -> str:
    """Result.opening_name fallback chain (chessmate_api.ml:41-51)."""
    if name:
        return name
    if slug:
        return " ".join(w.capitalize() for w in slug.split("_"))
    return "Unknown opening"


def _year_of(played_on: Any) -> int:
    """Result.year (chessmate_api.ml:29-35): leading year else 0."""
    if played_on is None:
        return 0
    text = str(played_on)
    if len(text) >= 4 and text[:4].isdigit():
        return int(text[:4])
    return 0


def _result_to_dict(row: Any) -> Dict[str, Any]:
    """One ranked game → the Result.to_json document
    (chessmate_api.ml:77-115; synopsis at :20-27)."""
    event = row["event"] if row["event"] else "Unspecified event"
    result = row["result"] if row["result"] else "*"
    white = row["white"] or ""
    black = row["black"] or ""
    slug = row["opening_slug"]
    return {
        "game_id": row["id"],
        "white": white,
        "black": black,
        "result": result,
        "year": _year_of(row["played_on"]),
        "event": event,
        "opening_slug": slug if slug else "unknown_opening",
        "opening_name": _opening_name(row["opening_name"], slug),
        "eco": row["eco_code"],
        "phases": list(row["phases"] or []),
        "themes": list(row["themes"] or []),
        "keywords": list(row["keywords"] or []),
        "white_elo": row["white_rating"],
        "black_elo": row["black_rating"],
        "synopsis": f"{white} vs {black} — {event} ({result})",
        "score": float(row["total_score"]),
        "vector_score": float(row["vector_score"]),
        "keyword_score": float(row["keyword_score"]),
        # no external evaluator is wired in this shim — the agent block
        # degrades exactly like the reference with no API key configured
        "agent_score": None,
        "agent_explanation": None,
        "agent_themes": [],
        "agent_reasoning_effort": None,
        "agent_usage": None,
    }


def summarize(results: List[Dict[str, Any]]) -> str:
    """result_formatter.ml:8-16: top-5 '#id white vs black (score %.2f)'."""
    return "\n".join(
        "#%d %s vs %s (score %.2f)"
        % (r["game_id"], r["white"], r["black"], r["score"])
        for r in results[:5]
    )


def answer_question(
    spark: SparkSession,
    tables: "HybridTables",
    question: str,
    limit: Optional[int] = None,
    offset: Optional[int] = None,
    dim: int = 16,
    timings: Optional[Dict[str, float]] = None,
    plan_cache: Optional[Dict[Any, Any]] = None,
) -> Dict[str, Any]:
    """Validate → analyse → execute → response payload
    (chessmate_api.ml:726-807 ``query_handler``).

    Raises :class:`ServingError` with the reference's 400-body message on
    invalid input; execution failures surface as RuntimeError with a
    sanitized message (the reference's 500 path, :755-757).

    Two Spark actions per request (round-11, was four): the total count
    and the page collect — ``returned``/``has_more`` derive from the
    collected rows instead of a separate count action on the same
    frame, and the keyset boundary lookup still applies on deep-offset
    requests only.

    ``plan_cache`` (opt-in): a dict the caller owns, passed through to
    ``plans.hybrid.execute`` — compiled plan lineages are reused across
    requests with equal plan parameters (the reference's prepared-
    statement warmth; see execute's docstring for the immutable-tables
    contract).  The HTTP server holds one per service instance.

    ``timings`` (opt-in): records per-action wall-clock seconds —
    ``analyse_s`` (driver-side NL parse), ``count_total_s`` (the Spark
    count action inside ``execute``), ``keyset_boundary_s`` (deep-offset
    requests only: the narrow boundary-key scan), ``collect_page_s``
    (the page materialization), and ``format_s`` (driver-side payload
    assembly).  The serving bench persists this breakdown so one
    aggregate latency number can't hide WHICH action regressed.
    """
    import time as _time

    from ..plans.hybrid import execute

    question = _validate_question(question)
    _t0 = _time.perf_counter()
    plan = analyse(
        Request(
            text=question,
            limit=_validate_limit(limit),
            offset=_validate_offset(offset),
        )
    )
    if timings is not None:
        timings["analyse_s"] = _time.perf_counter() - _t0
    try:
        execution = execute(
            tables, plan, dim=dim, timings=timings,
            count_returned=False, plan_cache=plan_cache,
        )
        _t0 = _time.perf_counter()
        rows = execution.results.collect()
        if timings is not None:
            timings["collect_page_s"] = _time.perf_counter() - _t0
    except ServingError:
        raise
    except Exception as exc:
        raise RuntimeError(sanitize_py(str(exc))) from exc

    _t0 = _time.perf_counter()
    results = [_result_to_dict(row) for row in rows]
    payload: Dict[str, Any] = {
        "question": question,
        "plan": plan_to_dict(plan),
        "summary": summarize(results) if results else SUMMARY_EMPTY,
        "results": results,
        "offset": plan.offset,
        "limit": plan.limit,
        "total": execution.total,
        "has_more": plan.offset + len(rows) < execution.total,
        "agent_status": AGENT_STATUS_DISABLED,
    }
    if execution.warnings:
        payload["warnings"] = list(execution.warnings)
    if timings is not None:
        timings["format_s"] = _time.perf_counter() - _t0
    return payload


def batch_answer(
    spark: SparkSession,
    tables: "HybridTables",
    questions: List[str],
    limit: Optional[int] = None,
    offset: Optional[int] = None,
    dim: int = 16,
    timings: Optional[Dict[str, float]] = None,
) -> List[Dict[str, Any]]:
    """N questions → N ``answer_question``-shaped payloads from ONE
    DataFrame program (plans/hybrid_batch.py) — two Spark actions
    total instead of four per question, with per-question parameters
    riding a broadcast metadata frame so plan size is O(1) in N.
    That is the whole economics of batch serving (the per-action and
    per-plan-construction overhead dominates the warm path): measured
    ~30x the one-at-a-time rate at N=64 (SERVE_BENCH.json
    ``batch_mode``).

    Payload-identical to calling ``answer_question`` per question
    (property-tested): same validation, same plan echo, same result
    documents in the same order, same totals/has_more/summary.
    ``limit``/``offset`` apply to every question (per-question values
    ride the questions' own text, exactly as in the sequential path).

    ``timings`` (opt-in): ``analyse_s`` (driver NL parse, all
    questions), ``batch_execute_s`` (plan build + the totals action),
    ``collect_s`` (the single result collect), ``format_s`` (driver
    payload assembly)."""
    import time as _time

    from ..plans.hybrid_batch import batch_execute

    if not questions:
        return []
    _t0 = _time.perf_counter()
    cleaned = [_validate_question(q) for q in questions]
    plans = [
        analyse(
            Request(
                text=q,
                limit=_validate_limit(limit),
                offset=_validate_offset(offset),
            )
        )
        for q in cleaned
    ]
    if timings is not None:
        timings["analyse_s"] = _time.perf_counter() - _t0
    _t0 = _time.perf_counter()
    try:
        execution = batch_execute(tables, plans, dim=dim)
        if timings is not None:
            timings["batch_execute_s"] = _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        rows = execution.results.collect()
        if timings is not None:
            timings["collect_s"] = _time.perf_counter() - _t0
    except ServingError:
        raise
    except Exception as exc:
        raise RuntimeError(sanitize_py(str(exc))) from exc

    _t0 = _time.perf_counter()
    by_q: Dict[int, list] = {}
    for row in rows:
        by_q.setdefault(row["question_id"], []).append(row)
    payloads: List[Dict[str, Any]] = []
    for i, (question, plan) in enumerate(zip(cleaned, plans)):
        ordered = sorted(by_q.get(i, []), key=lambda r: r["_rank"])
        results = [_result_to_dict(row) for row in ordered]
        total = execution.totals.get(i, 0)
        payload: Dict[str, Any] = {
            "question": question,
            "plan": plan_to_dict(plan),
            "summary": summarize(results) if results else SUMMARY_EMPTY,
            "results": results,
            "offset": plan.offset,
            "limit": plan.limit,
            "total": total,
            "has_more": plan.offset + len(results) < total,
            "agent_status": AGENT_STATUS_DISABLED,
        }
        if execution.warnings:
            payload["warnings"] = list(execution.warnings)
        payloads.append(payload)
    if timings is not None:
        timings["format_s"] = _time.perf_counter() - _t0
    return payloads


def format_response_text(payload: Dict[str, Any]) -> str:
    """The CLI renderer (search_command.ml ``parse_success``): summary
    block, plan echo lines, numbered result lines with synopsis."""
    plan = payload["plan"]
    filters = plan["filters"]
    filters_line = (
        ", ".join(f"{f['field']}={f['value']}" for f in filters)
        if filters
        else "No structured filters detected"
    )
    rating = plan["rating"]
    rating_bits = [
        f"{field}={rating[field]}"
        for field in ("white_min", "black_min", "max_rating_delta")
        if rating[field] is not None
    ]
    lines = [
        f"Summary: {payload['summary']}",
        f"Offset: {payload['offset']}",
        f"Limit: {plan['limit']}",
        f"Total matches: {payload['total']}",
        "Has more: %s" % ("yes" if payload["has_more"] else "no"),
        f"Agent status: {payload.get('agent_status') or 'unknown'}",
        f"Filters: {filters_line}",
        "Ratings: %s" % (", ".join(rating_bits) if rating_bits else "none"),
    ]
    results = payload["results"]
    if not results:
        lines.append("No matching games found")
    else:
        lines.append("Results:")
        for index, item in enumerate(results, start=1):
            opening = item["opening_name"] or item["opening_slug"] or (
                "unknown_opening"
            )
            lines.append(
                "%d. #%d %s vs %s [%s] score %.2f\n       %s"
                % (
                    index,
                    item["game_id"],
                    item["white"],
                    item["black"],
                    opening,
                    item["score"],
                    item["synopsis"],
                )
            )
    return "\n".join(lines)
