"""Property tests for round-6 operators: the LSH banding ladder's scale
contract and the unicode tokenizer vs a Unicode-category reference."""

from __future__ import annotations

import unicodedata

from hypothesis import given, settings
from hypothesis import strategies as st

from chessmate_spark.operators.dedup import lsh_banding_for

# ---------------------------------------------------------------------------
# lsh_banding_for: the quadratic-candidate guard


@settings(max_examples=200, deadline=None)
@given(n=st.integers(min_value=1, max_value=10**12))
def test_banding_ladder_shape(n):
    planes, tables = lsh_banding_for(n)
    # 62 = int64 signature-packing limit (never binds in practice)
    assert 3 <= planes <= 62
    assert tables >= 8
    if n <= 800:
        assert (planes, tables) == (3, 32)  # the oracle-regime floor


@settings(max_examples=100, deadline=None)
@given(n=st.integers(min_value=800, max_value=10**11))
def test_banding_candidate_factor_never_grows_superlinearly(n):
    # n >= 800: inside the oracle floor the ladder is frozen by design
    """The candidate volume ~ tables * n^2 / 2^planes must grow at most
    ~linearly per corpus decade: jumping from n to 10n may multiply the
    factor-adjusted candidates by at most ~30 (linear x ladder
    granularity), never the ~100x a frozen ladder gives."""
    p1, t1 = lsh_banding_for(n)
    p2, t2 = lsh_banding_for(10 * n)
    cand1 = t1 * n * n / (1 << p1)
    cand2 = t2 * (10 * n) * (10 * n) / (1 << p2)
    assert cand2 <= 30 * cand1


def test_banding_planes_monotone_in_n():
    prev = 0
    for n in (100, 800, 801, 2000, 20_000, 200_000, 2_000_000, 10**9):
        planes, _tables = lsh_banding_for(n)
        assert planes >= prev
        prev = planes


# ---------------------------------------------------------------------------
# unicode tokenizer vs a Unicode-category reference
#
# Alphabet avoids the known engine-divergent case folds (word-final
# capital sigma, Turkish dotted I) — the production entry documents the
# same exclusion.

_SAFE = (
    "abcXYZ019 .,!-_()"
    "äöüßÄÖÜ"      # German
    "бвгдежБВГДЕ"  # Cyrillic
    "αβγδεζΑΒΓΔ"   # Greek (no sigma)
    "東京将棋対局"   # CJK
)


def _py_unicode_tokens(text: str) -> list[str]:
    lowered = text.lower()
    out, cur = [], []
    for ch in lowered:
        if unicodedata.category(ch)[0] in ("L", "N"):
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


@settings(max_examples=25, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet=_SAFE, max_size=40), min_size=1, max_size=8
    )
)
def test_unicode_tokenizer_matches_category_reference(spark, texts):
    from pyspark.sql import functions as F

    from chessmate_spark.functions.text import unicode_norm_tokens_expr

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [
        r["toks"]
        for r in df.select(
            unicode_norm_tokens_expr(F.col("t")).alias("toks")
        ).collect()
    ]
    assert got == [_py_unicode_tokens(t) for t in texts]


# ---------------------------------------------------------------------------
# lsh_plan_for: the threshold-aware feasibility planner (round 10)


def _detection_at(threshold: float, n_planes: int, n_tables: int) -> float:
    import math

    p_min = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    return 1.0 - (1.0 - p_min**n_planes) ** n_tables


@settings(max_examples=150, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=10**12),
    threshold=st.floats(min_value=0.05, max_value=0.99),
)
def test_lsh_plan_meets_recall_target_when_pruning(n, threshold):
    """Whatever banding the planner commits to as PRUNING must actually
    reach the recall target at the threshold — the contract callers
    route on."""
    from chessmate_spark.operators.dedup import lsh_plan_for

    plan = lsh_plan_for(n, threshold, target_recall=0.9999)
    assert 0.0 <= plan.candidate_fraction <= 1.0
    assert 1 <= plan.n_planes <= 62
    assert plan.n_tables >= 1
    if plan.prunes:
        assert plan.candidate_fraction < 0.5
        assert _detection_at(threshold, plan.n_planes, plan.n_tables) >= 0.9999


@settings(max_examples=150, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=10**7),
    threshold=st.floats(min_value=0.05, max_value=0.99),
)
def test_lsh_plan_prunes_iff_any_banding_prunes(n, threshold):
    """The REVERSE direction of the pruning contract (the round-10
    review's finding): `prunes` answers the docstring's ANY-banding
    feasibility question, not whether the cost-minimal banding happens
    to prune — verified against a direct enumeration of the feasible
    (planes, tables) grid."""
    import math

    from chessmate_spark.operators.dedup import lsh_plan_for

    p_min = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    exists = False
    for b in range(1, 63):
        pb = p_min**b
        if pb <= 0.0:
            break
        if pb >= 1.0:
            tables = 1
        else:
            denom = math.log1p(-pb)
            if denom == 0.0:
                continue
            tables = max(1, math.ceil(math.log(1.0 - 0.9999) / denom))
        if tables > 4096:
            continue
        if 1.0 - (1.0 - 0.5**b) ** tables < 0.5:
            exists = True
            break
    assert lsh_plan_for(n, threshold, target_recall=0.9999).prunes == exists


def test_lsh_plan_prunes_high_threshold_regime():
    """Threshold 0.8 (real near-dup territory): pruning is feasible and
    cheap — candidate fraction under 5% at every corpus decade."""
    from chessmate_spark.operators.dedup import lsh_plan_for

    for n in (2_000, 10**6, 10**9):
        plan = lsh_plan_for(n, 0.8, target_recall=0.9999)
        assert plan.prunes
        assert plan.candidate_fraction < 0.06
        assert _detection_at(0.8, plan.n_planes, plan.n_tables) >= 0.9999


def test_lsh_plan_degenerate_low_threshold_regime():
    """Threshold 0.35 (the d7 fixture threshold, p_min = 0.614): NO
    recall-0.9999 banding keeps candidates below half of all-pairs —
    the planner must refuse to prune so the entry routes exact/cells
    (the round-10 second-sf sweep's d7 finding, made structural)."""
    from chessmate_spark.operators.dedup import lsh_plan_for

    for n in (2_000, 10**6, 10**9):
        plan = lsh_plan_for(n, 0.35, target_recall=0.9999)
        assert not plan.prunes
        assert plan.candidate_fraction >= 0.5


def test_lsh_plan_hand_computed_fixed_point():
    """Pin the collision MODEL itself, not just the argmin plumbing:
    the property tests above re-derive the planner's enumeration, so a
    shared modeling error would pass both — these constants were
    computed by hand from Charikar's formula, independent of the code.

    n=5000, threshold 0.85, recall 0.9999:
      p_min = 1 - arccos(0.85)/pi = 0.823398...
      b=13: p^13 = 0.0796  -> T = ceil(ln(1e-4)/ln(1-0.0796)) = 111,
            frac = 1-(1-2^-13)^111 = 0.01346,
            cost = 111*C(5000,2)/2^13 + 5000*111 = 724,339
      b=12 -> T=91,  cost 732,654;  b=14 -> T=136, cost 783,739
    so (13, 111) is the cost-argmin among pruning bandings."""
    from chessmate_spark.operators.dedup import lsh_plan_for

    plan = lsh_plan_for(5000, 0.85, target_recall=0.9999)
    assert (plan.n_planes, plan.n_tables) == (13, 111)
    assert plan.prunes
    assert abs(plan.candidate_fraction - 0.013459) < 1e-4


def test_minhash_plan_hand_computed_fixed_points():
    """The Jaccard twin's model pin (same rationale).  At j=0.5, recall
    0.999: rows=2 -> j^2=0.25, bands = ceil(ln(1e-3)/ln(0.75)) = 25
    (50 hashes); rows=3 -> j^3=0.125, bands = ceil(ln(1e-3)/ln(0.875))
    = 52 (156 hashes).  Background 0.05: bg_frac(r=2) = 1-(1-0.0025)^25
    = 0.0607, bg_frac(r=3) = 1-(1-0.000125)^52 = 0.00648.  Costs
    (bg_frac*C(n,2) + n*(hashes+bands)): at n=500 rows=2 wins (45,067
    vs 104,808); at n=5000 rows=3 wins (1,120,975 vs 1,133,104 —
    r=2's spurious mass dominates), so the committed d24/d26 dials."""
    from chessmate_spark.operators.dedup import minhash_banding_plan

    p500 = minhash_banding_plan(500, 0.5, target_recall=0.999)
    assert (p500.num_hashes, p500.bands, p500.rows) == (50, 25, 2)
    assert p500.prunes
    p5000 = minhash_banding_plan(5000, 0.5, target_recall=0.999)
    assert (p5000.num_hashes, p5000.bands, p5000.rows) == (156, 52, 3)
    assert p5000.prunes
    assert abs(p5000.background_fraction - 0.006479) < 1e-4


def test_minhash_plan_small_n_guard():
    """n < 2 has no pairs: every banding's costs tie near zero, so the
    argmin verdict is meaningless (and negative n would flip cost
    signs) — the planner must early-return the degenerate (1, 1, 1)
    non-pruning plan, mirroring lsh_plan_for's first branch."""
    from chessmate_spark.operators.dedup import minhash_banding_plan

    for n in (1, 0, -3):
        plan = minhash_banding_plan(n, 0.5)
        assert (plan.num_hashes, plan.bands, plan.rows) == (1, 1, 1)
        assert not plan.prunes


def test_lsh_plan_fraction_monotone_in_threshold():
    """Higher thresholds can only make pruning easier: the committed
    plan's candidate fraction is non-increasing along the threshold
    grid at every corpus decade."""
    from chessmate_spark.operators.dedup import lsh_plan_for

    for n in (2_000, 10**6, 10**9):
        fractions = [
            lsh_plan_for(n, t).candidate_fraction
            for t in (0.35, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95)
        ]
        assert all(
            later <= earlier + 1e-12
            for earlier, later in zip(fractions, fractions[1:])
        )


# ---------------------------------------------------------------------------
# pq_operating_point: the corpus-scaled PQ dial ladder (round 10)


def test_pq_operating_point_rungs():
    """The measured rungs: the historic sf0.01 point at gate scale, the
    sf0.1-green point through 8k, the committed-smoke ksub beyond."""
    from chessmate_spark.operators.similarity import pq_operating_point

    assert pq_operating_point(495) == (16, 32)
    assert pq_operating_point(800) == (16, 32)
    assert pq_operating_point(1_995) == (64, 128)
    assert pq_operating_point(8_000) == (64, 128)
    assert pq_operating_point(8_001) == (256, 256)
    assert pq_operating_point(10**9) == (256, 256)
    # the rung constant is the SHORTLIST (96/384/768): a different k
    # gets the same measured shortlist, not k-proportional re-rank work
    assert pq_operating_point(495, k=10) == (16, 10)
    assert pq_operating_point(1_995, k=10) == (64, 39)
    assert pq_operating_point(10**9, k=1) == (256, 768)


@settings(max_examples=100, deadline=None)
@given(n=st.integers(min_value=1, max_value=10**12))
def test_pq_operating_point_monotone(n):
    """Both dials are non-decreasing in corpus size — a larger corpus
    never gets a coarser codebook or a smaller shortlist."""
    from chessmate_spark.operators.similarity import pq_operating_point

    k1, o1 = pq_operating_point(n)
    k2, o2 = pq_operating_point(10 * n)
    assert k2 >= k1
    assert o2 >= o1


# ---------------------------------------------------------------------------
# minhash_banding_plan: the Jaccard-LSH banding planner (round 10)


def _minhash_detection(j: float, rows: int, bands: int) -> float:
    return 1.0 - (1.0 - j**rows) ** bands


@settings(max_examples=150, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=10**12),
    threshold=st.floats(min_value=0.05, max_value=0.99),
)
def test_minhash_plan_meets_recall_target(n, threshold):
    """Any returned banding must reach the recall target at the
    threshold, its shape must be consistent (hashes = rows * bands,
    within budget), and a pruning verdict must mean what it says."""
    from chessmate_spark.operators.dedup import minhash_banding_plan

    plan = minhash_banding_plan(n, threshold, target_recall=0.999)
    assert plan.num_hashes == plan.rows * plan.bands
    assert plan.num_hashes <= 512
    assert _minhash_detection(threshold, plan.rows, plan.bands) >= 0.999
    assert abs(
        plan.detection_at_threshold
        - _minhash_detection(threshold, plan.rows, plan.bands)
    ) < 1e-9
    if plan.prunes:
        assert plan.background_fraction < 0.5


def test_minhash_plan_default_dial_contrast():
    """The documented motivation: the fixed (16, 4) dial detects 0.98
    at Jaccard 0.9 but only ~0.23 at 0.5; the planner's point at 0.5
    reaches the 0.999 target with a sub-1% background fraction."""
    from chessmate_spark.operators.dedup import minhash_banding_plan

    assert 0.22 < _minhash_detection(0.5, 4, 4) < 0.24
    assert _minhash_detection(0.9, 4, 4) > 0.98
    plan = minhash_banding_plan(10_000, 0.5, target_recall=0.999)
    assert plan.prunes
    assert plan.detection_at_threshold >= 0.999
    assert plan.background_fraction < 0.01


@settings(max_examples=60, deadline=None)
@given(threshold=st.floats(min_value=0.2, max_value=0.95))
def test_minhash_plan_rows_monotone_in_corpus(threshold):
    """A bigger corpus never gets FEWER rows per band: spurious-pair
    mass scales with C(n,2), so selectivity must not decrease with n."""
    from chessmate_spark.operators.dedup import minhash_banding_plan

    r_small = minhash_banding_plan(10_000, threshold).rows
    r_big = minhash_banding_plan(10**9, threshold).rows
    assert r_big >= r_small


def test_minhash_plan_infeasible_threshold_never_claims_prune():
    """The infeasible fallback (every target-reaching banding blows the
    hash budget) must report prunes=False — the round-10 second
    review caught it returning a background-only True, which would
    route a caller onto a 1-hash banding with ~1% detection."""
    from chessmate_spark.operators.dedup import minhash_banding_plan

    plan = minhash_banding_plan(10_000, 0.01, target_recall=0.999)
    assert plan.num_hashes == 1
    assert not plan.prunes
    assert plan.detection_at_threshold < 0.999


# ---------------------------------------------------------------------------
# minhash_planned_dial / minhash_route: the production routing (round 11)


def test_minhash_planned_dial_decade_steps():
    """The decade-quantized step function a static SQL oracle can
    mirror: dial changes exactly at the committed bracket boundaries."""
    from chessmate_spark.operators.dedup import minhash_planned_dial

    def dial(n):
        p = minhash_planned_dial(n, 0.5)
        return (p.num_hashes, p.bands)

    assert dial(2) == (50, 25)      # floored at the 500-doc gate corpus
    assert dial(500) == (50, 25)
    assert dial(999) == (50, 25)
    assert dial(1_000) == (156, 52)
    assert dial(5_000) == (156, 52)
    assert dial(99_999) == (156, 52)
    assert dial(100_000) == (432, 108)
    assert dial(999_999) == (432, 108)


def test_minhash_route_regimes():
    """Prunable threshold -> the planned dial; proven-non-prunable
    threshold (the production entries' 0.1) -> the declared fallback,
    with the refusing plan carried for disclosure."""
    from chessmate_spark.operators.dedup import minhash_route

    h, b, plan = minhash_route(500, 0.5)
    assert (h, b) == (50, 25) and plan.prunes
    h, b, plan = minhash_route(5_000, 0.5)
    assert (h, b) == (156, 52) and plan.prunes

    for n in (500, 5_000, 500_000):
        h, b, plan = minhash_route(n, 0.1)
        assert (h, b) == (16, 4), "non-prunable must return the fallback"
        assert not plan.prunes
        # the disclosure: the planner's best banding at 0.1 admits ~97%
        # of all-pairs as background — why the fallback stands
        assert plan.background_fraction > 0.9


def test_minhash_adaptive_brackets_match_dial_function():
    """The d26 bracket table (what the oracle mirrors) must agree with
    minhash_planned_dial at every bracket edge and interior point."""
    from chessmate_spark.operators.dedup import minhash_planned_dial
    from chessmate_spark.plans.queries import _minhash_adaptive_brackets

    brackets = _minhash_adaptive_brackets()
    assert brackets[0][0] == 0
    for (lo, hi, hashes, bands), nxt in zip(brackets, brackets[1:] + [None]):
        if nxt is not None:
            assert nxt[0] == hi, "brackets must tile without gaps"
        for n in (max(lo, 2), (lo + hi) // 2, hi - 1):
            p = minhash_planned_dial(n, 0.5)
            assert (p.num_hashes, p.bands) == (hashes, bands), (
                f"bracket [{lo},{hi}) says ({hashes},{bands}) but the "
                f"dial at n={n} is ({p.num_hashes},{p.bands})"
            )


def test_hyperplane_adaptive_brackets_match_dial_function():
    """The d27 bracket table (what the oracle mirrors) must agree with
    hyperplane_planned_dial at every bracket edge and interior point —
    the d26 contract applied to the cosine family."""
    from chessmate_spark.operators.dedup import hyperplane_planned_dial
    from chessmate_spark.plans.queries import _hyperplane_adaptive_brackets

    brackets = _hyperplane_adaptive_brackets()
    assert brackets[0][0] == 0
    for (lo, hi, planes, tables), nxt in zip(brackets, brackets[1:] + [None]):
        if nxt is not None:
            assert nxt[0] == hi, "brackets must tile without gaps"
        for n in (max(lo, 2), (lo + hi) // 2, hi - 1):
            p = hyperplane_planned_dial(n, 0.8)
            assert (p.n_planes, p.n_tables) == (planes, tables), (
                f"bracket [{lo},{hi}) says ({planes},{tables}) but the "
                f"dial at n={n} is ({p.n_planes},{p.n_tables})"
            )
    # the falling-fraction story the entry documents: candidate fraction
    # is non-increasing along the bracket ladder
    fracs = [
        hyperplane_planned_dial(max(lo, 2), 0.8).candidate_fraction
        for lo, _hi, _p, _t in brackets
    ]
    assert all(b <= a + 1e-12 for a, b in zip(fracs, fracs[1:]))
