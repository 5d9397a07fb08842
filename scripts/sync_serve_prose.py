#!/usr/bin/env python3
"""Render SERVE_BENCH.json's serving numbers into marker-delimited
blocks in EXPLAIN.md and SURVEY.md (`<!-- SERVE:BEGIN -->` ...
`<!-- SERVE:END -->`).

The round-8 verdict's #8: the serving claims (28.6 q/s, 27.7x
sequential) were quoted by hand in SURVEY/EXPLAIN the way bench
numbers used to be — the exact drift mode the BENCH/SMOKE pinning
closed.  Same cure: the prose is a RENDERING of the artifact,
`--write` regenerates the blocks, and tests/test_prose_consistency.py
asserts block == rendering, so a serve-bench rerun that changes the
headline numbers fails the suite until the prose is resynced (one
command: `python scripts/sync_serve_prose.py --write`).
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(ROOT, "SERVE_BENCH.json")
DOCS = ("EXPLAIN.md", "SURVEY.md")
BEGIN, END = "<!-- SERVE:BEGIN -->", "<!-- SERVE:END -->"


def render(record: dict) -> str:
    lines = [BEGIN]
    lines.append(
        f"- per-request (Spark-job-per-request, no result cache): cold "
        f"{record['cold_first_request_ms']} ms, warm p50 "
        f"{record['warm_p50_ms']} ms / p95 {record['warm_p95_ms']} ms, "
        f"{record['warm_req_per_s_c1']} req/s at c=1 over "
        f"{record['n_requests']} requests (reference baseline: "
        f"{record['reference_baseline']['p50_ms']} ms p50, "
        f"{record['reference_baseline']['req_per_s_c50']} req/s)"
    )
    cl = record.get("concurrency_ladder")
    if cl:
        rungs = ", ".join(
            f"c={r['concurrency']}: {r['req_per_s']} req/s "
            f"(p50 {r['p50_ms']} ms)"
            for r in cl.get("ladder", [])
        )
        lines.append(
            f"- under concurrency (thread-pool on the live socket, one "
            f"plan-cache key): {rungs} — throughput saturates at the "
            f"single-driver ceiling (~{cl['peak_req_per_s']} req/s "
            f"this run) while p50 grows ~linearly with c: queueing on "
            f"the Python driver's serialized GIL+Py4J path, not the "
            f"plan-cache lock (dict ops only), so per-request serving "
            f"is an O(10) req/s-per-driver surface and batch mode is "
            f"the throughput path"
        )
    bm = record.get("batch_mode")
    if bm:
        lines.append(
            f"- batch mode (one O(1)-size DataFrame program, min-of-2): "
            f"{bm['n_questions']} questions in {bm['batch_wall_s']} s = "
            f"{bm['questions_per_s']} q/s — "
            f"x{bm['speedup_vs_one_at_a_time']} the sequential rate; "
            f"peak {bm['peak_questions_per_s']} q/s on the N-ladder"
        )
        for rung in bm.get("ladder", []):
            marginal = rung.get("marginal_ms_per_question")
            shown = (
                "" if marginal is None
                else f", marginal {marginal} ms/question"
            )
            lines.append(
                f"  - N={rung['n_questions']}: {rung['batch_wall_s']} s, "
                f"{rung['questions_per_s']} q/s{shown}"
            )
        ref_qps = record["reference_baseline"]["req_per_s_c50"]
        peak = bm["peak_questions_per_s"]
        crossing = [
            r["n_questions"]
            for r in bm.get("ladder", [])
            if r["questions_per_s"] >= ref_qps
        ]
        if crossing:
            lines.append(
                f"  - crosses the reference's {ref_qps} req/s headline "
                f"at N={crossing[0]} (one-process batch engine vs the "
                f"reference's c=50 OLTP stack); peak {peak} q/s"
            )
        else:
            lines.append(
                f"  - peak {peak} q/s stays below the reference's "
                f"{ref_qps} req/s headline"
                + (
                    f" — bottleneck: {bm['bottleneck']}"
                    if bm.get("bottleneck")
                    else ""
                )
            )
    lines.append(END)
    return "\n".join(lines)


def sync(write: bool) -> int:
    with open(ARTIFACT) as fh:
        record = json.load(fh)
    block = render(record)
    pattern = re.compile(
        re.escape(BEGIN) + r".*?" + re.escape(END), re.DOTALL
    )
    rc = 0
    for doc in DOCS:
        path = os.path.join(ROOT, doc)
        with open(path) as fh:
            text = fh.read()
        m = pattern.search(text)
        if not m:
            print(f"{doc}: no {BEGIN} block")
            rc = 1
            continue
        if m.group(0) == block:
            print(f"{doc}: in sync")
            continue
        if write:
            with open(path, "w") as fh:
                fh.write(text[: m.start()] + block + text[m.end():])
            print(f"{doc}: rewritten")
        else:
            print(f"{doc}: STALE (run with --write)")
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(sync("--write" in sys.argv[1:]))
