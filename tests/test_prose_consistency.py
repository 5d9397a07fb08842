"""Prose == artifact: the SMOKE blocks in EXPLAIN.md / SURVEY.md must be
the exact rendering of SCALE_SMOKE.json (scripts/sync_smoke_prose.py).

Round 6's closing prose quoted a mid-round smoke run and drifted from
the committed artifact — exactly how a future regression hides.  This
is the bench-coverage-test pattern applied to documentation: regenerate
with `python scripts/sync_smoke_prose.py --write` after any smoke rerun.
"""

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))


def test_smoke_blocks_match_artifact():
    import json

    import sync_smoke_prose as s

    with open(s.ARTIFACT) as fh:
        record = json.load(fh)
    block = s.render(record)
    pattern = re.compile(
        re.escape(s.BEGIN) + r".*?" + re.escape(s.END), re.DOTALL
    )
    for doc in s.DOCS:
        with open(os.path.join(ROOT, doc)) as fh:
            text = fh.read()
        m = pattern.search(text)
        assert m, f"{doc} lost its SMOKE block"
        assert m.group(0) == block, (
            f"{doc}'s SMOKE block is stale vs SCALE_SMOKE.json — "
            "run: python scripts/sync_smoke_prose.py --write"
        )


def test_smoke_artifact_is_green():
    """The committed smoke record itself must be green: a red artifact
    with synced prose is still a red artifact."""
    import json

    import sync_smoke_prose as s

    with open(s.ARTIFACT) as fh:
        record = json.load(fh)
    assert record["ok"] is True
    assert record["failures"] == []


def test_bench_blocks_match_artifact():
    """Same contract for the headline bench (round-7 finding: three
    same-tree single-shot runs spanned 174.5-271.2 s and SURVEY quoted
    one by hand): the BENCH blocks must be the exact rendering of the
    committed bench_out.json."""
    import json

    import sync_bench_prose as b

    with open(b.ARTIFACT) as fh:
        record = json.load(fh)
    block = b.render(record)
    pattern = re.compile(
        re.escape(b.BEGIN) + r".*?" + re.escape(b.END), re.DOTALL
    )
    for doc in b.DOCS:
        with open(os.path.join(ROOT, doc)) as fh:
            text = fh.read()
        m = pattern.search(text)
        assert m, f"{doc} lost its BENCH block"
        assert m.group(0) == block, (
            f"{doc}'s BENCH block is stale vs bench_out.json — "
            "run: python scripts/sync_bench_prose.py --write"
        )


def test_bench_artifact_is_complete():
    """The committed bench record must be complete (no errored queries)
    — an incomplete record sums a smaller suite and its headline number
    is not comparable across rounds."""
    import json

    import sync_bench_prose as b

    with open(b.ARTIFACT) as fh:
        record = json.load(fh)
    assert record["complete"] is True


def test_bench_artifact_matches_headline():
    """The committed bench record must cover exactly bench.HEADLINE:
    'complete' is computed against the HEADLINE of the run that
    produced the artifact, so adding entries to HEADLINE without
    rerunning the bench would otherwise ship a silently-stale record —
    a pathologically slow new entry would be invisible until the next
    driver run (the round-8 third-review finding)."""
    import json

    import bench
    import sync_bench_prose as b

    with open(b.ARTIFACT) as fh:
        record = json.load(fh)
    assert set(record["queries"]) == set(bench.HEADLINE), (
        "bench_out.json's query set drifted from bench.HEADLINE — "
        "rerun: python bench.py && python scripts/sync_bench_prose.py --write"
    )


def test_smoke_artifact_covers_default_queries():
    """Same gate for the smoke record as for the bench record: every
    DEFAULT_QUERIES entry must have a row in the committed
    SCALE_SMOKE.json queries block — adding an entry to the list
    without rerunning (at least a targeted) smoke would otherwise ship
    a silently-stale record in which a superlinear new entry is
    invisible until the next full rerun."""
    import json

    import scale_smoke as ss
    import sync_smoke_prose as s

    with open(s.ARTIFACT) as fh:
        record = json.load(fh)
    have = set(record.get("queries", {}))
    want = set(ss.DEFAULT_QUERIES)
    assert have == want, (
        f"SCALE_SMOKE.json rows drifted from DEFAULT_QUERIES — "
        f"missing {sorted(want - have)}, stale {sorted(have - want)}; "
        "targeted rerun: python scripts/scale_smoke.py <name> "
        "(a removed entry needs its stale row pruned by a full rerun)"
    )


def test_serve_blocks_match_artifact():
    """Round-8 verdict #8: the serving claims (q/s, speedup vs
    sequential) were quoted by hand in SURVEY/EXPLAIN the way bench
    numbers used to be.  Same contract as BENCH/SMOKE: the SERVE
    blocks must be the exact rendering of the committed
    SERVE_BENCH.json."""
    import json

    import sync_serve_prose as sv

    with open(sv.ARTIFACT) as fh:
        record = json.load(fh)
    block = sv.render(record)
    pattern = re.compile(
        re.escape(sv.BEGIN) + r".*?" + re.escape(sv.END), re.DOTALL
    )
    for doc in sv.DOCS:
        with open(os.path.join(ROOT, doc)) as fh:
            text = fh.read()
        m = pattern.search(text)
        assert m, f"{doc} lost its SERVE block"
        assert m.group(0) == block, (
            f"{doc}'s SERVE block is stale vs SERVE_BENCH.json — "
            "run: python scripts/sync_serve_prose.py --write"
        )


def test_serve_artifact_has_ladder():
    """The committed serving record must carry the N-ladder (round-8
    verdict #5: batch serving beyond N=64 was unmeasured; round-9 #5
    extended it to the 4096/16384 knee hunt — where the engine crosses
    the reference's 500 req/s headline) with a flat-or-falling marginal
    per-question cost — the measured pin on the 'plan is O(1) in N'
    claim."""
    import json

    import sync_serve_prose as sv

    with open(sv.ARTIFACT) as fh:
        record = json.load(fh)
    ladder = record["batch_mode"]["ladder"]
    assert [r["n_questions"] for r in ladder] == [
        64, 256, 1024, 4096, 16384,
    ]
    # the round-9 verdict's crossing question, answered and pinned:
    # the one-process batch engine passes the reference's 500 req/s
    # somewhere on the ladder (first measured: 1022.8 q/s at N=4096)
    ref = record["reference_baseline"]["req_per_s_c50"]
    assert any(r["questions_per_s"] >= ref for r in ladder)
    marginals = [
        r["marginal_ms_per_question"] for r in ladder[1:]
    ]
    # the marginal cost must not GROW with N (per-question work that
    # scales with N would falsify the O(1)-plan claim).  The original
    # consecutive-pair 1.25x pin proved tighter than the HOST NOISE on
    # these sub-ms marginals (three quiet round-11 runs wobbled
    # 1.18x/1.30x/1.42x rung-to-rung with no trend, one even negative;
    # a round-13 run read a FALLING tail 0.70/0.59/0.36 whose 1024-rung
    # wobble still tripped the every-rung form), so the pin keys on
    # where an O(N) term cannot hide: the LARGEST rung's marginal —
    # 16x the data of the 1024 rung, so noise is smallest there and a
    # real linear term grows it ~16x — must stay within 1.75x of the
    # tail's best, and the tail must not rise monotonically.
    tail = [m for m in marginals[1:]]
    floor = min(m for m in tail if m > 0)
    assert tail[-1] <= floor * 1.75, (
        f"largest-N marginal grew past the tail floor: {marginals}"
    )
    assert not (tail[0] < tail[1] < tail[2]), (
        f"marginal per-question cost rises monotonically: {marginals}"
    )


def test_bench_default_run_does_not_touch_committed_artifact():
    """Round-8 verdict finding: a bare `python bench.py` must never
    overwrite the committed bench_out.json (it left the driver's tree
    failing this very suite until a checkout).  Pin the contract
    statically: the default out path is the UNTRACKED local file, the
    committed artifact is only written under --commit, and .gitignore
    covers the local file so a rerun leaves `git status` clean."""
    import bench  # noqa: F401 — import proves the module parses
    import inspect

    src = inspect.getsource(bench.main)
    # the committed artifact name appears only on the --commit branch
    assert 'args.commit' in src
    assert src.count('"bench_out.json"') == 1
    assert '"bench_out.local.json"' in src
    with open(os.path.join(ROOT, ".gitignore")) as fh:
        assert "bench_out.local.json" in fh.read().splitlines()


def test_smoke_artifact_carries_round10_blocks():
    """Round-10 regression: a targeted `scale_smoke.py <query>` run
    rebuilds the record and carries prior probe blocks from a
    HARDCODED list — ann_recall_clustered and route_crossover were
    silently dropped the first time.  Pin their presence (and their
    headline facts) so any future drop goes red instead of quietly
    shipping an artifact that contradicts the committed prose."""
    import json

    import sync_smoke_prose as sm

    with open(sm.ARTIFACT) as fh:
        record = json.load(fh)
    annc = record["ann_recall_clustered"]
    assert annc["corpus_rows"] > 10_000
    assert annc["ivf_nlist64_nprobe4"]["recall"] >= 0.9
    rx = record["route_crossover"]
    assert rx["bloom"]["crossover_scale"] == 16_000_000
    assert rx["cells"]["crossover_scale"] == 2_000
    # the 48M rung's broadcast failure is the survives-where-broadcast-
    # fails evidence — it must stay recorded
    last_bloom = rx["bloom"]["ladder"][-1]
    assert last_bloom["broadcast"]["status"] != "ok"
    assert last_bloom["bloom"]["status"] == "ok"
    # the carry list in scale_smoke.main must know both blocks
    import inspect

    import scale_smoke

    src = inspect.getsource(scale_smoke.main)
    assert '"ann_recall_clustered"' in src
    assert '"route_crossover"' in src


def test_smoke_artifact_carries_round11_blocks():
    """Round-11 probe blocks: the d25 pruning-arm measurement, the
    chess pipeline's 100x point, and the adaptive-dial row of the
    minhash planner probe must stay in the carried record with their
    headline facts."""
    import json

    import sync_smoke_prose as sm

    with open(sm.ARTIFACT) as fh:
        record = json.load(fh)
    hp = record["hyperplane_planned"]
    assert hp["recall"] >= hp["recall_floor"]
    assert hp["precision"] == 1.0
    assert hp["candidate_fraction_measured"] < 0.5
    assert (hp["planes"], hp["tables"]) == (9, 51)
    chess = record["chess_pipeline"]
    assert chess["x100"]["games"] == 50_000
    assert chess["games_per_sec_x100"] > 100
    mh = record["minhash_planner"]
    assert "adaptive" in mh and "adaptive_dial" in mh
    assert mh["adaptive"]["recall"] >= mh["recall_floor"]
