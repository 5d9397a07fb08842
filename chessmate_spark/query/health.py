"""Health probes: the reference's readiness summary re-expressed for a
Spark-backed engine (lib/core/health.ml:1-95).

Same contract: each check runs a probe under a latency timer and lands in
one of three states (``ok`` / ``error`` / ``skipped``); the summary is
``error`` when any REQUIRED check failed, ``degraded`` when any optional
check failed, else ``ok`` (health.ml ``summary_status``); HTTP maps ok→200
and degraded/error→503 (health.ml:92-94 ``http_status_of``).  JSON shape
matches ``check_to_yojson``/``summary_to_yojson`` field for field.

Dependency mapping — the reference probes postgres/qdrant/redis/openai/
embeddings; the Spark engine's analogues are:
  * ``spark``        (required) — the session can run a trivial job;
  * ``vector_store`` (required) — the serving tables resolve their schemas;
  * ``embedding_service`` (optional) — skipped: the deterministic V5
    fallback embedder is the default provider (no external service);
  * ``agent``        (optional) — skipped unless an agent client is wired.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional

from ..functions.guards import sanitize_py


class ProbeSkipped(Exception):
    """Raised by a probe body to mark the dependency as not configured."""


@dataclass
class Check:
    name: str
    required: bool
    latency_ms: Optional[float]
    status: str  # "ok" | "error" | "skipped"
    detail: Optional[str]

    def to_dict(self) -> Dict[str, Any]:
        return {
            "name": self.name,
            "status": self.status,
            "required": self.required,
            "latency_ms": self.latency_ms,
            "detail": self.detail,
        }


def run_probe(
    name: str, required: bool, probe: Callable[[], Optional[str]]
) -> Check:
    """health.ml ``run_probe``: time the probe, sanitize whatever detail
    or error text it produces, never let an exception escape."""
    started = time.monotonic()
    try:
        detail = probe()
        status, text = "ok", (sanitize_py(detail) if detail else None)
    except ProbeSkipped as skip:
        status, text = "skipped", sanitize_py(str(skip))
    except Exception as exc:  # noqa: BLE001 — the summary IS the error channel
        status, text = "error", sanitize_py(str(exc))
    latency_ms = (time.monotonic() - started) * 1000.0
    return Check(
        name=name,
        required=required,
        latency_ms=latency_ms,
        status=status,
        detail=text,
    )


def summary_status(checks: List[Check]) -> str:
    if any(c.required and c.status == "error" for c in checks):
        return "error"
    if any(c.status == "error" for c in checks):
        return "degraded"
    return "ok"


def summary_to_dict(checks: List[Check]) -> Dict[str, Any]:
    return {
        "status": summary_status(checks),
        "checks": [c.to_dict() for c in checks],
    }


def http_status_of(status: str) -> int:
    return 200 if status == "ok" else 503


def api_summary(spark, tables=None) -> Dict[str, Any]:
    """The /health payload: probe the engine's actual dependencies."""

    def probe_spark() -> Optional[str]:
        spark.sql("SELECT 1").collect()
        return f"spark {spark.version}"

    def probe_tables() -> Optional[str]:
        if tables is None:
            # a required dependency that is absent is UNHEALTHY, not
            # skipped — /health must go 503 when serving cannot work
            raise RuntimeError("serving tables not attached")
        n_cols = len(tables.games.columns) + len(tables.players.columns)
        if tables.position_vectors is not None:
            n_cols += len(tables.position_vectors.columns)
        return f"{n_cols} columns resolved"

    def probe_embedding() -> Optional[str]:
        raise ProbeSkipped("deterministic fallback embedder (no service)")

    def probe_agent() -> Optional[str]:
        raise ProbeSkipped("agent client not configured")

    checks = [
        run_probe("spark", True, probe_spark),
        run_probe("vector_store", True, probe_tables),
        run_probe("embedding_service", False, probe_embedding),
        run_probe("agent", False, probe_agent),
    ]
    return summary_to_dict(checks)
