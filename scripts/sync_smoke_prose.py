#!/usr/bin/env python3
"""Render SCALE_SMOKE.json's tripwire numbers into the marker-delimited
blocks in EXPLAIN.md and SURVEY.md (`<!-- SMOKE:BEGIN -->` ...
`<!-- SMOKE:END -->`).

Round 6's closing prose quoted a MID-ROUND smoke run and drifted from
the committed artifact (worst "5.8x" vs the artifact's 9.5x) — exactly
how a future regression hides.  This makes the prose a RENDERING of the
artifact: `--write` regenerates the blocks in place, and
tests/test_prose_consistency.py asserts block == rendering, so any
smoke rerun that changes the headline numbers fails the suite until the
prose is resynced (one command: `python scripts/sync_smoke_prose.py
--write`).
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(ROOT, "SCALE_SMOKE.json")
DOCS = ("EXPLAIN.md", "SURVEY.md")
BEGIN, END = "<!-- SMOKE:BEGIN -->", "<!-- SMOKE:END -->"


def render(record: dict) -> str:
    lines = [BEGIN]
    q = record.get("queries")
    if q:
        worst_name = max(q, key=lambda k: q[k]["ratio"])
        worst = q[worst_name]
        lines.append(
            f"- two-point tripwire: {len(q)} entries, worst `{worst_name}` "
            f"{worst['ratio']}x (gate {record['ratio_limit']}x), "
            f"failures {len(record.get('failures', []))}"
        )
    else:
        # a probe-only record (e.g. `--linearity` on a fresh host) has
        # no two-point block yet — render what exists rather than crash
        lines.append(
            "- two-point tripwire: NOT RUN in this artifact (probe-only "
            "record) — run scripts/scale_smoke.py for the full block"
        )
    lin = record.get("linearity", {})
    for name in sorted(k for k, v in lin.items() if isinstance(v, dict)):
        v = lin[name]
        m = v["marginal_ratio"]
        shown = (
            f"marginal {m}"
            if m is not None
            else f"two-point fallback {v['fallback_two_point']} "
            "(fixed-cost-dominated through 3x)"
        )
        gate = v.get("gate", lin["marginal_limit"])
        lines.append(
            f"- linearity `{name}`: t1 {v['t1_s']}s / t3 {v['t3_s']}s / "
            f"t10 {v['t10_s']}s — {shown} "
            f"(gate {gate}, linear ideal 3.5)"
        )
    pb = record.get("pq_bytes")
    if pb:
        sh, pq = pb["shuffle"], pb["parquet"]
        lines.append(
            f"- pq payload (measured, {pb['corpus_rows']:,} rows) — "
            f"shuffle: vectors {sh['vectors_bytes']:,} B / array codes "
            f"{sh['codes_array_int_bytes']:,} B / packed codes "
            f"{sh['codes_packed_binary_bytes']:,} B (packed "
            f"x{sh['packed_vs_vectors_ratio']} vs vectors, "
            f"x{sh['packed_vs_array_ratio']} vs array); parquet: "
            f"{pq['vectors_bytes']:,} / {pq['codes_array_int_bytes']:,} / "
            f"{pq['codes_packed_binary_bytes']:,} B — array codes win the "
            f"scan (parquet dictionary-encodes int arrays; binary gets "
            f"none)"
        )
    cp = record.get("chess_pipeline")
    if cp:
        lines.append(
            f"- chess pipeline: ingest {cp['x1']['ingest_s']}s -> "
            f"{cp['x10']['ingest_s']}s (x{cp['ingest_ratio']}), drain "
            f"{cp['x1']['drain_s']}s -> {cp['x10']['drain_s']}s "
            f"(x{cp['drain_ratio']}) over {cp['x1']['games']} -> "
            f"{cp['x10']['games']} games (gate {cp['gate']}; min-of-2, "
            f"drain batch ∝ backlog)"
        )
    inc = record.get("incremental_lifecycle")
    if inc:
        line = (
            f"- incremental lifecycle (store-backed increment, batch "
            f"{inc['batch_rows']:,} rows): wall {inc['x1']['secs']}s -> "
            f"{inc['x10']['secs']}s (x{inc['wall_ratio']}, gate "
            f"{inc['wall_gate']}) as existing grows "
            f"{inc['x1']['existing_rows']:,} -> "
            f"{inc['x10']['existing_rows']:,}; candidate ids "
            f"{inc['x1']['candidate_ids']:,} -> "
            f"{inc['x10']['candidate_ids']:,} (x{inc['cand_ratio']}, "
            f"gate {inc['cand_gate']}) — increment cost tracks the "
            f"batch, not the corpus"
        )
        x100 = inc.get("x100")
        if x100:
            line += (
                f"; decade rung at existing "
                f"{x100['existing_rows']:,}: wall {x100['secs']}s "
                f"(x{inc['wall_ratio_x100']}, gate "
                f"{inc['x100_wall_gate']}), SHUFFLE RECORDS "
                f"{inc['x1']['shuffle_records']:,} -> "
                f"{x100['shuffle_records']:,} "
                f"(x{inc['shuffle_ratio_x100']}, gate "
                f"{inc['shuffle_gate']}) — no exchange carries "
                f"store-side band rows"
            )
        lines.append(line)
    ad = record.get("ann_drift")
    if ad:
        def curve(points):
            return ", ".join(
                f"{p['appended_fraction']}: recall {p['recall']} / psi "
                f"{p['psi']}" for p in points
            )

        line = (
            f"- ann drift (appended IVFPQ, k={ad['k']}, nprobe "
            f"{ad['nprobe']}, base {ad['base_rows']:,} rows): stationary "
            f"[{curve(ad['stationary'])}] vs drifted "
            f"[{curve(ad['drifted'])}] — retrain trigger psi >= "
            f"{ad['retrain_psi']} fires at/before every materially "
            f"decayed step and never on stationary appends"
        )
        rb = ad.get("drifted_rebuild")
        if rb:
            line += (
                f"; one maintainer turn past the trigger "
                f"(psi {rb['trigger_psi']}) {rb['action']} the index "
                f"and recall recovers to {rb['recall_after_rebuild']} "
                f"(floor {ad['stationary_floor']}) with the drift "
                f"baseline reset (psi {rb['psi_after_rebuild']})"
            )
        lines.append(line)
    ann = record.get("ann_recall")
    if ann:
        rows = {k: v for k, v in ann.items() if isinstance(v, dict)}
        shown = ", ".join(
            f"`{k}` {v['recall']}" for k, v in sorted(rows.items())
        )
        lines.append(
            f"- ann recall@{ann['k']} at 10x ({ann['corpus_rows']:,} "
            f"vectors, {ann['n_queries']} queries): {shown}"
        )
    annc = record.get("ann_recall_clustered")
    if annc:
        rows = {k: v for k, v in annc.items() if isinstance(v, dict)}
        shown = ", ".join(
            f"`{k}` {v['recall']}" for k, v in sorted(rows.items())
        )
        lines.append(
            f"- ann recall@{annc['k']} on the CLUSTERED "
            f"(mixture-of-Gaussians) corpus ({annc['corpus_rows']:,} "
            f"vectors, {annc['n_queries']} queries): {shown}"
        )
    sem = record.get("semdedup_recall")
    if sem:
        rows = {k: v for k, v in sem.items() if isinstance(v, dict)}
        shown = ", ".join(
            f"`{k}` {v['recall']}" for k, v in sorted(rows.items())
        )
        lines.append(
            f"- semdedup recall at 10x ({sem['sample_rows']:,} sample "
            f"rows, {sem['exact_pairs']:,} exact pairs): {shown}"
        )
    dc = record.get("decontam_recall")
    if dc:
        pts = ", ".join(
            f"n_probe={p} {dc[f'cells_p{p}']['recall']} "
            f"(floor {dc[f'cells_p{p}']['floor']})"
            for p in (1, 2, 4)
            if f"cells_p{p}" in dc
        )
        lines.append(
            f"- d23 cells-route recall vs exact broadcast at 10x "
            f"({dc['eval_rows']} eval rows, {dc['exact_flagged']} exact "
            f"flagged, {dc['n_clusters']} cells): {pts}"
        )
    br = record.get("bloom_route")
    if br:
        lines.append(
            f"- t25 bloom route at query-table scale "
            f"({br['query_terms']:,} query terms = "
            f"{br['true_query_terms']:,} true + "
            f"{br['miss_query_terms']:,} miss, over "
            f"{br['vocab_terms']:,} corpus vocab, {br['n_queries']:,} "
            f"queries): suspect fraction {br['suspect_fraction']}, wall "
            f"x{br['wall_ratio_vs_broadcast']} vs broadcast (gate "
            f"{br['wall_gate']}), outputs identical"
        )
    rx = record.get("route_crossover")
    if rx:
        def _cell(c):
            return (
                f"{c['secs']}s" if c.get("status") == "ok"
                else c.get("status", "?")
            )

        for op, unit in (("cells", "eval rows"), ("bloom", "query terms")):
            b = rx.get(op)
            if not b:
                continue
            pts = "; ".join(
                f"{r['scale']:,}: broadcast {_cell(r['broadcast'])} vs "
                f"{op} {_cell(r[op])}"
                for r in b["ladder"]
            )
            cx = b.get("crossover_scale")
            head = (
                f"- route crossover `{op}` ({rx.get('worker', '')}; "
                f"{unit}): {pts} — "
            )
            lines.append(
                f"{head}crossover at {cx:,}" if cx
                else f"{head}no crossover in ladder"
            )
            lines.append(f"  - heuristic: {b['heuristic']}")
    lp = record.get("lsh_planner")
    if lp:
        rows = {k: v for k, v in lp.items()
                if isinstance(v, dict) and v.get("prunes")}
        pts = "; ".join(
            f"thr {k.split('_', 1)[1].replace('_', '.')}: "
            f"({v['planes']},{v['tables']}) recall {v['recall']} "
            f"(floor {lp['recall_floor']}), candidates "
            f"{v['candidates_measured']:,} measured vs "
            f"{v['candidates_isotropic_est']:,} isotropic est "
            f"(fraction {v['candidate_fraction_measured']})"
            for k, v in sorted(rows.items())
        )
        verdict = ("no-prune" if lp.get("no_prune_verdict_at_0_35")
                   else "PRUNE (unexpected)")
        lines.append(
            f"- lsh planner on the clustered corpus ({lp['rows']:,} "
            f"rows): {pts}; verdict at the 0.35 fixture threshold: "
            f"{verdict} (d7 routes exact there)"
        )
    mp = record.get("minhash_planner")
    if mp:
        pl, df_ = mp["planned"], mp["default"]
        lines.append(
            f"- minhash planner at Jaccard {mp['threshold']} "
            f"({mp['rows']:,} docs, {mp['positives']} planted positives): "
            f"planned ({pl['num_hashes']} hashes, {pl['bands']} bands, "
            f"{mp['plan_rows_per_band']} rows/band) recall {pl['recall']} "
            f"(floor {mp['recall_floor']}) vs default (16, 4) recall "
            f"{df_['recall']} — background fraction "
            f"{mp['plan_background_fraction']}"
        )
    dd = record.get("dedup_decomposition")
    if dd:
        for op in ("d7", "d13"):
            lo, hi = dd[f"{op}_x1"], dd[f"{op}_x10"]
            lines.append(
                f"- decomposition `{op}`: candidates "
                f"{lo['candidate_pairs']:,} -> {hi['candidate_pairs']:,} "
                f"(x{dd[f'{op}_candidate_ratio']}), output "
                f"{lo['output_pairs']:,} -> {hi['output_pairs']:,}, "
                f"wall x{dd[f'{op}_secs_ratio']}, per-candidate cost "
                f"x{dd[f'{op}_per_candidate_cost_ratio']} "
                f"(gate {dd['per_candidate_limit']})"
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
