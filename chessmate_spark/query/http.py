"""HTTP front: the reference's Opium service as a stdlib ``http.server``
app over the already-tested serving functions.

Routes (chessmate_api.ml:809-827):
  * ``GET  /health``       — probe summary, 200/503 (health.py);
  * ``GET  /metrics``      — Prometheus text: request counters/latency +
                             rate-limiter lines (lib/api_metrics.ml names);
  * ``GET  /openapi.yaml`` — the bundled spec (chessmate_api.ml:486-524);
  * ``GET  /query``        — ``q``/``limit``/``offset`` params
                             (chessmate_api.ml:674-697 ``extract_query``);
  * ``POST /query``        — JSON body {question, limit, offset}
                             (chessmate_api.ml:698-723).

Cross-cutting, in reference order: the rate-limit middleware answers 429
with ``Retry-After`` and the exact body text (chessmate_api.ml:272-292);
parse/validation failures answer 400 with the reference error strings
(``question parameter missing``, ``limit must be an integer``, …);
execution failures answer 500 with a sanitized message; every response is
recorded into the request metrics (chessmate_api.ml:526-543 middleware).

This module is TRANSPORT ONLY — analysis, execution, validation,
limiting, health, and formatting all live in (and are tested through)
their own modules; nothing here touches a DataFrame.  It is deliberately
outside the correctness oracle (SURVEY §2.11): tests drive it over a real
socket, but the driver's entries never depend on a port.
"""

from __future__ import annotations

import json
import math
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional, Tuple
from urllib.parse import parse_qs, urlparse

from ..functions.guards import sanitize_py
from ..functions.rate_limiter import Limited, RateLimiter
from .health import api_summary, http_status_of
from .serve import ServingError, answer_question

MAX_BODY_BYTES_DEFAULT = 1 << 20


class RequestMetrics:
    """chessmate_api_requests_total / _request_duration_seconds exposition
    (lib/api_metrics.ml:50-57 names; sum+count exposition per route)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.totals: Dict[Tuple[str, int], int] = {}
        self.latency: Dict[str, List[float]] = {}

    def record(self, route: str, status: int, seconds: float) -> None:
        with self._lock:
            key = (route, status)
            self.totals[key] = self.totals.get(key, 0) + 1
            self.latency.setdefault(route, [0.0, 0.0])
            self.latency[route][0] += seconds
            self.latency[route][1] += 1

    def exposition(self) -> str:
        with self._lock:
            lines = [
                "# TYPE chessmate_api_requests_total counter",
            ]
            for (route, status), n in sorted(self.totals.items()):
                lines.append(
                    "chessmate_api_requests_total"
                    f'{{route="{route}",status="{status}"}} {n}'
                )
            lines.append(
                "# TYPE chessmate_api_request_duration_seconds summary"
            )
            for route, (total, count) in sorted(self.latency.items()):
                lines.append(
                    "chessmate_api_request_duration_seconds_sum"
                    f'{{route="{route}"}} {total:.6f}'
                )
                lines.append(
                    "chessmate_api_request_duration_seconds_count"
                    f'{{route="{route}"}} {int(count)}'
                )
        return "\n".join(lines) + "\n"


def _parse_int_param(field: str, raw: str) -> int:
    """chessmate_api.ml ``parse_int_string`` error strings."""
    stripped = raw.strip()
    if not stripped:
        raise ServingError(f"{field} must not be empty")
    try:
        return int(stripped)
    except ValueError:
        raise ServingError(f"{field} must be an integer") from None


def _extract_get(url) -> Dict[str, Any]:
    params = parse_qs(url.query, keep_blank_values=True)

    def first(name: str) -> Optional[str]:
        vals = params.get(name)
        return vals[0] if vals else None

    question = first("q")
    if question is None:
        raise ServingError("question parameter missing")
    out: Dict[str, Any] = {"question": question}
    for field in ("limit", "offset"):
        raw = first(field)
        if raw is not None:
            out[field] = _parse_int_param(field, raw)
    return out


def _extract_post(body: bytes) -> Dict[str, Any]:
    try:
        payload = json.loads(body.decode("utf-8"))
    except (ValueError, UnicodeDecodeError):
        raise ServingError("invalid JSON payload") from None
    if not isinstance(payload, dict) or payload.get("question") is None:
        raise ServingError("question parameter missing")
    question = payload["question"]
    if not isinstance(question, str):
        raise ServingError("question must be a string")
    out: Dict[str, Any] = {"question": question}
    for field in ("limit", "offset"):
        if field in payload and payload[field] is not None:
            value = payload[field]
            if isinstance(value, str):
                value = _parse_int_param(field, value)
            out[field] = value
    return out


class ChessmateApi:
    """The assembled service: call :meth:`start` for a live socket, or use
    :meth:`handle` directly (tests exercise both)."""

    def __init__(
        self,
        spark,
        tables,
        limiter: Optional[RateLimiter] = None,
        dim: int = 16,
        openapi_path: Optional[str] = None,
        max_body_bytes: int = MAX_BODY_BYTES_DEFAULT,
    ) -> None:
        self.spark = spark
        self.tables = tables
        self.limiter = limiter
        self.dim = dim
        self.openapi_path = openapi_path
        self.max_body_bytes = max_body_bytes
        self.metrics = RequestMetrics()
        # compiled-plan cache shared across requests (the reference's
        # prepared-statement warmth; plans.hybrid.execute documents the
        # immutable-tables contract and the PLAN_CACHE_MAX bound).
        # Concurrency: execute() guards its dict ops with
        # _PLAN_CACHE_LOCK (round 12 — concurrent eviction could
        # double-pop a key and next(iter()) can raise mid-resize; the
        # races are NOT benign).  The lock covers dict ops only, never
        # Spark work, so it does not serialize the service; a
        # double-compile of one key remains last-write-wins on
        # identical lineages.
        self._plan_cache: Dict = {}
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None

    # -- route bodies -----------------------------------------------------

    def _openapi_text(self) -> Optional[str]:
        import os

        path = self.openapi_path
        if path is None:
            path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))),
                "docs", "openapi.yaml",
            )
        try:
            with open(path, encoding="utf-8") as fh:
                return fh.read()
        except OSError:
            return None

    def handle(
        self,
        method: str,
        path: str,
        body: bytes = b"",
        remote_addr: str = "127.0.0.1",
    ) -> Tuple[int, Dict[str, str], bytes]:
        """One request → (status, headers, body) — the transport-free core
        the socket handler and the tests share."""
        started = time.monotonic()
        url = urlparse(path)
        route = url.path
        status, headers, payload = self._dispatch(
            method, url, body, remote_addr
        )
        self.metrics.record(route, status, time.monotonic() - started)
        return status, headers, payload

    def _dispatch(
        self, method: str, url, body: bytes, remote_addr: str
    ) -> Tuple[int, Dict[str, str], bytes]:
        json_type = {"Content-Type": "application/json"}
        text_type = {"Content-Type": "text/plain; charset=utf-8"}

        if self.limiter is not None:
            decision = self.limiter.check(
                remote_addr, body_bytes=len(body) if body else None
            )
            if isinstance(decision, Limited):
                retry_after = max(1, int(math.ceil(max(0.0, decision.retry_after))))
                headers = dict(text_type)
                headers["Retry-After"] = str(retry_after)
                text = (
                    f"Rate limit exceeded. Retry after {retry_after} seconds."
                )
                return 429, headers, text.encode()

        if url.path == "/health" and method == "GET":
            summary = api_summary(self.spark, self.tables)
            return (
                http_status_of(summary["status"]),
                json_type,
                json.dumps(summary).encode(),
            )

        if url.path == "/metrics" and method == "GET":
            body_text = self.metrics.exposition()
            if self.limiter is not None:
                lines = self.limiter.metrics()
                if lines:
                    if not body_text.endswith("\n"):
                        body_text += "\n"
                    body_text += "\n".join(lines) + "\n"
            return 200, text_type, body_text.encode()

        if url.path == "/openapi.yaml" and method == "GET":
            spec = self._openapi_text()
            if spec is None:
                err = {
                    "error": "OpenAPI specification unavailable: spec file missing"
                }
                return 500, json_type, json.dumps(err).encode()
            return (
                200,
                {"Content-Type": "application/yaml; charset=utf-8"},
                spec.encode(),
            )

        if url.path == "/query":
            try:
                if method == "GET":
                    request = _extract_get(url)
                elif method == "POST":
                    if len(body) > self.max_body_bytes:
                        err = {"error": "request body too large"}
                        return 413, json_type, json.dumps(err).encode()
                    request = _extract_post(body)
                else:
                    raise ServingError("unsupported method")
                payload = answer_question(
                    self.spark,
                    self.tables,
                    request["question"],
                    limit=request.get("limit"),
                    offset=request.get("offset"),
                    dim=self.dim,
                    plan_cache=self._plan_cache,
                )
                return 200, json_type, json.dumps(payload).encode()
            except ServingError as exc:
                err = {"error": str(exc)}
                return 400, json_type, json.dumps(err).encode()
            except Exception as exc:  # noqa: BLE001 — the 500 path
                err = {"error": sanitize_py(str(exc))}
                return 500, json_type, json.dumps(err).encode()

        err = {"error": "not found"}
        return 404, json_type, json.dumps(err).encode()

    # -- socket lifecycle -------------------------------------------------

    def start(self, port: int = 0, host: str = "127.0.0.1") -> int:
        """Bind + serve on a daemon thread; returns the bound port."""
        app = self

        class Handler(BaseHTTPRequestHandler):
            def _run(self, method: str) -> None:
                length = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(length) if length else b""
                status, headers, payload = app.handle(
                    method, self.path, body,
                    remote_addr=self.client_address[0],
                )
                self.send_response(status)
                for key, value in headers.items():
                    self.send_header(key, value)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def do_GET(self) -> None:  # noqa: N802 — stdlib contract
                self._run("GET")

            def do_POST(self) -> None:  # noqa: N802
                self._run("POST")

            def log_message(self, *args) -> None:  # silence stderr chatter
                pass

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
