#!/usr/bin/env python3
"""Render bench_out.json's headline numbers into the marker-delimited
blocks in EXPLAIN.md and SURVEY.md (`<!-- BENCH:BEGIN -->` ...
`<!-- BENCH:END -->`) — the sync_smoke_prose pattern applied to the
bench record.

Round 7's three same-tree measurements read 174.5 / 271.2 / 177.4 s and
SURVEY's closing sentence hand-quoted one of them; together with the
single-shot timing that made the committed record unable to distinguish
"regressed 38%" from "the host was busy".  bench.py now times min-of-2
per query, and this script makes the prose a RENDERING of the committed
artifact: `--write` regenerates the blocks in place, and
tests/test_prose_consistency.py asserts block == rendering, so any
bench rerun that changes the headline numbers fails the suite until the
prose is resynced (one command: `python scripts/sync_bench_prose.py
--write`).
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(ROOT, "bench_out.json")
DOCS = ("EXPLAIN.md", "SURVEY.md")
BEGIN, END = "<!-- BENCH:BEGIN -->", "<!-- BENCH:END -->"


def render(record: dict) -> str:
    q = record.get("queries", {})
    timing = record.get("timing", "single-shot")
    lines = [BEGIN]
    lines.append(
        f"- headline suite: {record['value']} s / {len(q)} queries at "
        f"sf{record['sf']} ({timing} per query; "
        f"complete={record.get('complete')}"
        + (f", errors={len(record['errors'])}" if record.get("errors") else "")
        + ")"
    )
    if q:
        top = sorted(q, key=q.get, reverse=True)[:5]
        lines.append(
            "- slowest 5: "
            + ", ".join(f"`{n}` {q[n]} s" for n in top)
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
