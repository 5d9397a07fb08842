"""HTTP front: the Opium route surface (chessmate_api.ml:809-827) over a
real socket — query happy paths, the reference 400/404/429 bodies, health
status mapping, metrics exposition, and the bundled OpenAPI spec."""

import json
import urllib.error
import urllib.request
from pathlib import Path

import pytest

from chessmate_spark.functions.rate_limiter import RateLimiter
from chessmate_spark.query.http import ChessmateApi

FIXTURES = Path(__file__).parent / "fixtures"

CANONICAL_QUESTION = (
    "Find King's Indian games where White is 2500 and Black is"
    " 100 points lower"
)


@pytest.fixture(scope="module")
def tables(spark):
    from chessmate_spark.ingest import ingest_pgn_text
    from chessmate_spark.plans.hybrid import HybridTables
    from chessmate_spark.plans.queries import _CHESS_FIXTURE
    from chessmate_spark.streaming import JobsState, drain_jobs

    ingest = ingest_pgn_text(spark, _CHESS_FIXTURE)
    state = drain_jobs(
        JobsState(jobs=ingest.embedding_jobs),
        ingest.positions, ingest.games, ingest.players,
        batch_size=8, dim=8,
    )
    return HybridTables(
        games=ingest.games, players=ingest.players,
        position_vectors=state.position_vectors,
    )


@pytest.fixture(scope="module")
def api(spark, tables):
    server = ChessmateApi(spark, tables, dim=8)
    port = server.start(port=0)
    yield f"http://127.0.0.1:{port}", server
    server.stop()


def _get(base, path):
    try:
        with urllib.request.urlopen(base + path) as resp:
            return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as err:
        return err.code, dict(err.headers), err.read()


def _post(base, path, payload):
    data = payload if isinstance(payload, bytes) else json.dumps(payload).encode()
    req = urllib.request.Request(
        base + path, data=data, headers={"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as err:
        return err.code, dict(err.headers), err.read()


def test_get_query_canonical(api):
    base, _ = api
    q = urllib.request.quote(CANONICAL_QUESTION)
    status, _, body = _get(base, f"/query?q={q}&limit=3")
    assert status == 200
    payload = json.loads(body)
    assert payload["question"] == CANONICAL_QUESTION
    assert payload["total"] == 1
    assert payload["results"][0]["game_id"] == 2
    assert payload["agent_status"] == "disabled"


def test_post_query_matches_get(api):
    base, _ = api
    status, _, body = _post(
        base, "/query", {"question": CANONICAL_QUESTION, "limit": 3}
    )
    assert status == 200
    get_status, _, get_body = _get(
        base, "/query?q=" + urllib.request.quote(CANONICAL_QUESTION) + "&limit=3"
    )
    assert json.loads(body) == json.loads(get_body)


@pytest.mark.parametrize(
    "path,message",
    [
        ("/query", "question parameter missing"),
        ("/query?q=", "question parameter missing"),
        ("/query?q=chess&limit=abc", "limit must be an integer"),
        ("/query?q=chess&limit=", "limit must not be empty"),
        ("/query?q=chess&limit=0", "limit must be >= 1"),
        ("/query?q=chess&limit=9999", "limit must be <= 500"),
        ("/query?q=chess&offset=-1", "offset must be >= 0"),
    ],
)
def test_get_query_reference_400_bodies(api, path, message):
    base, _ = api
    status, _, body = _get(base, path)
    assert status == 400
    assert json.loads(body) == {"error": message}


@pytest.mark.parametrize(
    "payload,message",
    [
        (b"{not json", "invalid JSON payload"),
        ({}, "question parameter missing"),
        ({"question": 7}, "question must be a string"),
        ({"question": "   "}, "question parameter missing"),
    ],
)
def test_post_query_reference_400_bodies(api, payload, message):
    base, _ = api
    status, _, body = _post(base, "/query", payload)
    assert status == 400
    assert json.loads(body) == {"error": message}


def test_health_ok_and_shape(api):
    base, _ = api
    status, _, body = _get(base, "/health")
    assert status == 200
    summary = json.loads(body)
    assert summary["status"] == "ok"
    by_name = {c["name"]: c for c in summary["checks"]}
    assert by_name["spark"]["required"] and by_name["spark"]["status"] == "ok"
    assert by_name["vector_store"]["status"] == "ok"
    assert by_name["embedding_service"]["status"] == "skipped"
    for check in summary["checks"]:
        assert set(check) == {
            "name", "status", "required", "latency_ms", "detail"
        }


def test_health_degrades_to_503_without_tables(spark):
    from chessmate_spark.query.health import api_summary, http_status_of

    summary = api_summary(spark, None)
    assert summary["status"] == "error"  # vector_store is required
    assert http_status_of(summary["status"]) == 503


def test_metrics_exposition(api):
    base, _ = api
    _get(base, "/query?q=chess")  # ensure at least one /query sample
    status, headers, body = _get(base, "/metrics")
    assert status == 200
    assert headers["Content-Type"].startswith("text/plain")
    text = body.decode()
    assert 'chessmate_api_requests_total{route="/query",status="200"}' in text
    assert 'chessmate_api_request_duration_seconds_count{route="/query"}' in text


def test_openapi_served_as_yaml(api):
    base, _ = api
    status, headers, body = _get(base, "/openapi.yaml")
    assert status == 200
    assert headers["Content-Type"].startswith("application/yaml")
    assert b"/query" in body and b"openapi" in body


def test_unknown_route_404(api):
    base, _ = api
    status, _, body = _get(base, "/nope")
    assert status == 404


def test_rate_limited_429_with_retry_after(spark, tables):
    clock = [1000.0]
    limiter = RateLimiter(
        tokens_per_minute=60, bucket_size=2, time_source=lambda: clock[0]
    )
    server = ChessmateApi(spark, tables, limiter=limiter, dim=8)
    # transport-free core: same dispatch the socket handler runs
    ok1 = server.handle("GET", "/health")
    ok2 = server.handle("GET", "/health")
    limited = server.handle("GET", "/health")
    assert ok1[0] == 200 and ok2[0] == 200
    status, headers, body = limited
    assert status == 429
    retry = int(headers["Retry-After"])
    assert body.decode() == (
        f"Rate limit exceeded. Retry after {retry} seconds."
    )
    # tokens refill with the fake clock → allowed again
    clock[0] += 60
    assert server.handle("GET", "/health")[0] == 200
    # limiter lines joined into /metrics (api route surface)
    metrics = server.handle("GET", "/metrics")[2].decode()
    assert "api_rate_limited_total 1" in metrics
